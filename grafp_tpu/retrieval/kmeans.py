"""Lloyd k-means on TPU (matmul assignment + one-hot matmul update).

Used for the IVF coarse quantizer and PQ codebooks, replacing FAISS's
CPU/GPU trainer (reference eval.py:108-119). Assignment is a (M, d) x
(d, k) distance matmul; the centroid update is a (k, M) x (M, d) one-hot
matmul - both MXU-shaped. Empty clusters are re-seeded from random data
points (FAISS re-seeds from split clusters; either keeps k live cells).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def assign(data: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    """(M, d), (k, d) -> (M,) nearest-centroid ids."""
    # argmin ||x-c||^2 == argmax (x.c - ||c||^2/2)
    score = jnp.matmul(data, centroids.T, preferred_element_type=jnp.float32)
    score = score - 0.5 * jnp.sum(centroids * centroids, axis=-1)[None, :]
    return jnp.argmax(score, axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def kmeans(
    key: jax.Array, data: jnp.ndarray, k: int, iters: int = 20
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (centroids (k, d), assignment (M,)). data (M, d) float32."""
    m, d = data.shape
    init_idx = jax.random.permutation(key, m)[:k] if m >= k else (
        jnp.arange(k) % m
    )
    cent0 = data[init_idx]

    def step(carry, key_i):
        cent = carry
        a = assign(data, cent)
        onehot = jax.nn.one_hot(a, k, dtype=data.dtype)        # (M, k)
        sums = jnp.matmul(onehot.T, data, preferred_element_type=jnp.float32)
        counts = jnp.sum(onehot, axis=0)                        # (k,)
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        # re-seed empties from random points
        rand_pts = data[jax.random.randint(key_i, (k,), 0, m)]
        new = jnp.where((counts > 0)[:, None], new, rand_pts)
        return new, None

    keys = jax.random.split(key, iters)
    cent, _ = jax.lax.scan(step, cent0, keys)
    return cent, assign(data, cent)


def kmeans_multi(
    key: jax.Array, data: jnp.ndarray, k: int, iters: int = 20
) -> jnp.ndarray:
    """Independent k-means per leading axis (PQ subspaces):
    data (S, M, dsub) -> centroids (S, k, dsub). vmapped = all subspace
    trainings run as one batched program."""
    keys = jax.random.split(key, data.shape[0])
    cents, _ = jax.vmap(lambda kk, dd: kmeans(kk, dd, k, iters))(keys, data)
    return cents
