"""Test harness config: force CPU JAX with a virtual 8-device mesh.

Must run before jax initializes a backend, hence the env mutation at
import time. Multi-chip sharding paths are exercised on these virtual
devices (the real TPU is reserved for bench.py).
"""

import os

# Force-set: the ambient environment pins JAX_PLATFORMS to the TPU plugin,
# so setdefault would be a no-op.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The TPU plugin's sitecustomize registers its backend programmatically
# (jax.config jax_platforms='axon,cpu'), which overrides the env var; pin
# the config back to CPU before any backend initialization.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # function-scoped: every test gets the same deterministic stream
    # regardless of execution order
    return np.random.RandomState(0)
