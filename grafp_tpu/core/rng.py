"""RNG discipline.

The reference sprinkles ``np.random.seed(42)`` at module boundaries
(reference util.py:45,67, train.py:137, eval.py:244). Here all device-side
randomness is threaded through ``jax.random`` keys split from a single root
key per run; host-side index shuffling keeps the reference's seeded-numpy
convention (seed 42) so frozen dataset splits reproduce bit-exactly.
"""

from __future__ import annotations

from typing import Iterator

import jax
import numpy as np

REFERENCE_NUMPY_SEED = 42  # reference util.py:45


def root_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def epoch_key(root: jax.Array, epoch: int) -> jax.Array:
    return jax.random.fold_in(root, epoch)


def step_key(ekey: jax.Array, step: int) -> jax.Array:
    return jax.random.fold_in(ekey, step)


def key_stream(key: jax.Array) -> Iterator[jax.Array]:
    while True:
        key, sub = jax.random.split(key)
        yield sub


def reference_shuffle(n: int, seed: int = REFERENCE_NUMPY_SEED) -> np.ndarray:
    """Seeded index shuffle identical to the reference's dataset splits
    (util.py:43-46: np.random.seed then np.random.shuffle on arange)."""
    idx = np.arange(n)
    rng = np.random.RandomState(seed)
    rng.shuffle(idx)
    return idx
