"""Standalone fingerprint extraction (reference generate.py:19-103):

    python generate.py --test_dir DIR --ckp CKPT --output_dir OUT

No augmentation (ir/noise = None); fingerprints for every track in the
directory/index -> <output_dir>/fingerprints.npy.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description="GraFPrint Embedding generation")
    p.add_argument("--config", default="config/grafp.yaml", type=str)
    p.add_argument("--ckp", default=None, type=str)
    p.add_argument("--test_dir", default=None, type=str)
    p.add_argument("--output_dir", default="output", type=str)
    return p


def main(argv=None):
    from grafp_tpu.core.config import load_config
    from grafp_tpu.data.dataset import FingerprintDataset, TrackLoader
    from grafp_tpu.fp.builder import FingerprintPipeline, create_db
    from grafp_tpu.models import build_model

    args = build_argparser().parse_args(argv)
    cfg = load_config(args.config)

    print("Loading model...")
    model = build_model(cfg)
    dataset = FingerprintDataset(cfg, path=args.test_dir, train=False)
    loader = TrackLoader(dataset, list(range(len(dataset))))

    print("Loading checkpoint...")
    if args.ckp is None or not os.path.exists(args.ckp):
        print(f"=> no checkpoint found at '{args.ckp}'")
        return
    print(f"=> loading checkpoint '{args.ckp}'")
    from grafp_tpu.cli.test_fp_main import load_any_checkpoint

    params, batch_stats = load_any_checkpoint(args.ckp, model, cfg)
    pipeline = FingerprintPipeline(model, cfg, params, batch_stats)
    create_db(loader, pipeline, output_dir=args.output_dir, concat=True)


if __name__ == "__main__":
    main()
