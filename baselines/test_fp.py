#!/usr/bin/env python
"""Baseline-encoder eval driver (reference baselines/test_fp.py role):
the eval protocol with the tc9-tc12 offset/overlap ablation presets.
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
    import yaml

    from grafp_tpu.core.config import load_config

    # patch the preset table used by the shared driver
    orig_main = tfm.main

    argv = list(sys.argv[1:] if argv is None else argv)
    if "--encoder" not in " ".join(argv):
        argv += ["--encoder", "ast"]
    if "--config" not in " ".join(argv):
        argv += ["--config", "config/ast.yaml"]

    # inject baseline presets by monkeypatching the shared preset dict
    src_main = tfm.main.__globals__
    tfm_presets_patch = _BASELINE_PRESETS
    # the shared driver reads presets inline; emulate by pre-mutating
    # the config through a wrapper
    import argparse

    p = tfm.build_argparser()
    args, _ = p.parse_known_args(argv)
    if args.model in _BASELINE_PRESETS:
        cfg = load_config(args.config)
        cfg["offset"], cfg["overlap"] = _BASELINE_PRESETS[args.model]
        tmp = "baselines/_resolved_config.yaml"
        cfg.save(tmp)
        argv = [a for a in argv]
        if "--config" in argv:
            argv[argv.index("--config") + 1] = tmp
        else:
            argv += ["--config", tmp]
    orig_main(argv)


if __name__ == "__main__":
    main()
