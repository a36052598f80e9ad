#!/usr/bin/env python
"""Baseline-encoder eval driver (reference baselines/test_fp.py role):
the shared eval protocol with the tc9-tc12 offset/overlap ablation
presets (reference baselines/test_fp.py:186-197) and AST defaults.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import grafp_tpu.cli.test_fp_main as tfm

# reference baselines/test_fp.py:186-197 presets
_BASELINE_PRESETS = {
    "tc9": (0.2, 0.5), "tc10": (0.05, 0.9),
    "tc11": (0.1, 0.8), "tc12": (0.125, 0.75),
}


def main(argv=None):
    from grafp_tpu.core.config import load_config

    argv = list(sys.argv[1:] if argv is None else argv)
    if "--encoder" not in argv:
        argv += ["--encoder", "ast"]
    if "--config" not in argv:
        argv += ["--config", "config/ast.yaml"]

    # The shared driver knows only the grafp tc_27/29/30/31 presets; the
    # baseline tc9-tc12 presets are applied here by materializing a
    # resolved config with the preset's offset/overlap baked in.
    args, _ = tfm.build_argparser().parse_known_args(argv)
    if args.model in _BASELINE_PRESETS:
        cfg = load_config(args.config)
        cfg["offset"], cfg["overlap"] = _BASELINE_PRESETS[args.model]
        resolved = "baselines/_resolved_config.yaml"
        cfg.save(resolved)
        argv[argv.index("--config") + 1] = resolved
    tfm.main(argv)


if __name__ == "__main__":
    main()
