#!/usr/bin/env python
"""Reference-contract CLI shim: `python train.py --config ... --ckp ...`
(see grafp_tpu/cli/train_main.py)."""
from grafp_tpu.cli.train_main import main

if __name__ == "__main__":
    main()
