#!/usr/bin/env python
"""Memmap-format smoke test (reference unit_tests/db_test.py contract):
open every dummy_db under --emb_dir, print shapes, assert no raise."""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--emb_dir", required=True, type=str)


def main():
    args = parser.parse_args()
    from grafp_tpu.retrieval.memmap_io import load_memmap_data

    found = 0
    for shape_file in glob.glob(
        os.path.join(args.emb_dir, "**", "dummy_db_shape.npy"), recursive=True
    ):
        d = os.path.dirname(shape_file)
        data, shape = load_memmap_data(d, "dummy_db", display=False)
        print(f"{d}: dummy_db shape {tuple(shape)}")
        found += 1
    if not found:
        print(f"no dummy_db memmaps under {args.emb_dir}")


if __name__ == "__main__":
    main()
