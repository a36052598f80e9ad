#!/usr/bin/env python
"""Rewrite dataset paths into the experiment YAMLs (reference
setup_config.py contract)."""
import argparse

import yaml

from grafp_tpu.core.config import load_config


def main(args):
    for cfg_path in ["config/grafp.yaml", "config/ast.yaml"]:
        config = load_config(cfg_path)
        if args.train_dir is not None:
            config["train_dir"] = args.train_dir
        if args.val_dir is not None:
            config["val_dir"] = args.val_dir
        config["noise_dir"] = args.noise_dir
        config["ir_dir"] = args.ir_dir
        config.save(cfg_path)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--train_dir", required=False, default=None)
    parser.add_argument("--val_dir", required=False, default=None)
    parser.add_argument("--noise_dir", required=True)
    parser.add_argument("--ir_dir", required=True)
    main(parser.parse_args())
