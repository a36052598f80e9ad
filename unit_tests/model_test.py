#!/usr/bin/env python
"""Checkpoint-compatibility smoke test (reference unit_tests/
model_test.py contract): build the model, load --ckp, assert no raise.
Accepts both reference .pth and Orbax checkpoint paths."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--ckp", required=True, type=str)
parser.add_argument("--config", default="config/grafp.yaml", type=str)
parser.add_argument("--encoder", default="grafp", type=str)


def main():
    args = parser.parse_args()
    from grafp_tpu.cli.test_fp_main import load_any_checkpoint
    from grafp_tpu.core.config import load_config
    from grafp_tpu.models import build_model

    cfg = load_config(args.config)
    cfg["arch"] = args.encoder
    model = build_model(cfg)
    params, batch_stats = load_any_checkpoint(args.ckp, model, cfg)

    import jax
    import jax.numpy as jnp

    h, z = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.zeros((1, cfg["n_mels"], cfg["n_frames"])),
        False,
    )
    print(f"OK: checkpoint loads and runs; h={h.shape} z={z.shape}")


if __name__ == "__main__":
    main()
