#!/usr/bin/env python
"""Reference-contract CLI shim: fingerprint DB build + retrieval eval
(see grafp_tpu/cli/test_fp_main.py)."""
from grafp_tpu.cli.test_fp_main import create_table, main  # noqa: F401

if __name__ == "__main__":
    main()
