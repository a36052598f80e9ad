#!/usr/bin/env python
"""Baseline-encoder training driver (reference baselines/train.py role):
the shared driver wired to AST/NAFP with validation every 25 epochs
(reference baselines/train.py:87). Run from the repo root:
    python baselines/train.py --config config/ast.yaml --encoder ast ...
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from grafp_tpu.cli.train_main import main

if __name__ == "__main__":
    argv = list(sys.argv[1:])
    joined = " ".join(argv)
    if "--encoder" not in joined:
        argv += ["--encoder", "ast"]
    if "--config" not in joined:
        argv += ["--config", "config/ast.yaml"]
    if "--validate_every" not in joined:
        argv += ["--validate_every", "25"]
    main(argv)
