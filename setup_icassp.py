#!/usr/bin/env python
"""Reproducibility setup: rebase index-file paths onto local dataset
roots (reference setup_icassp.py contract)."""
import argparse
import os

from grafp_tpu.data.indexing import update_index

parser = argparse.ArgumentParser(description="Reproducibility setup")
parser.add_argument("--test_dir", default=None, type=str)
parser.add_argument("--ir_dir", default=None, type=str)
parser.add_argument("--noise_dir", default=None, type=str)
parser.add_argument("--eval_type", default="fma_medium", type=str)


def main():
    args = parser.parse_args()
    for d in ("data", "checkpoint", "runs"):
        os.makedirs(d, exist_ok=True)
    update_index(args.test_dir, f"data/{args.eval_type}.json")
    update_index(args.ir_dir, "data/ir.json")
    update_index(args.noise_dir, "data/noise.json")


if __name__ == "__main__":
    main()
