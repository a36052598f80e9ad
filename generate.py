#!/usr/bin/env python
"""Reference-contract CLI shim: standalone fingerprint extraction
(see grafp_tpu/cli/generate_main.py)."""
from grafp_tpu.cli.generate_main import main

if __name__ == "__main__":
    main()
