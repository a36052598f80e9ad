"""Fused neighbor-selection + max-relative aggregation strategies.

The MRConv graph op only ever consumes max_k(x_nbr) - x (models/gnn.py);
the neighbor INDICES are never needed downstream when dilation == 1 (the
reference's effective config). That opens TPU-native formulations that
skip the expensive top_k + gather pair entirely (measured on v5e at
B=256, N=1024, C=64: lax.top_k costs ~74 ms and take_along_axis ~37 ms
per block, vs 2.8 ms for the similarity matmul itself -
scripts/profile_components.py):

  'exact'      - lax.top_k + gather (reference semantics, slowest).
  'approx'     - lax.approx_max_k + gather (TPU partial-reduction top-k,
                 recall ~0.95 per neighbor; graph edges are a heuristic,
                 so a rare swapped 4th-vs-3rd neighbor is immaterial).
  'onehot'     - k rounds of (row argmax -> one-hot matmul -> mask):
                 each round extracts the current nearest neighbor's
                 features with an (N, N) x (N, C) matmul on the MXU and
                 folds it into a running elementwise max. EXACT k-NN
                 max-rel semantics, no top_k, no gather.

All return rel = max over the k nearest (self included) of x_j, shape
(B, N, C). Selection happens on stop_gradient'ed features (reference
builds graphs under no_grad, torch_edge.py:15).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from grafp_tpu.ops.knn import gather_neighbors, knn_graph, l2_normalize


def _similarity(x: jnp.ndarray, compute_dtype) -> jnp.ndarray:
    xn = l2_normalize(jax.lax.stop_gradient(x), axis=-1)
    xn = xn.astype(compute_dtype)
    return jnp.einsum("bnc,bmc->bnm", xn, xn,
                      preferred_element_type=jnp.float32)


def max_neighbors_exact(x: jnp.ndarray, k: int,
                        compute_dtype=jnp.float32) -> jnp.ndarray:
    idx = knn_graph(x, k)
    return jnp.max(gather_neighbors(x, idx), axis=2)


def max_neighbors_approx(x: jnp.ndarray, k: int,
                         compute_dtype=jnp.float32) -> jnp.ndarray:
    sim = _similarity(x, compute_dtype)
    _, idx = jax.lax.approx_max_k(sim, k)
    return jnp.max(gather_neighbors(x, idx.astype(jnp.int32)), axis=2)


def max_neighbors_onehot(x: jnp.ndarray, k: int,
                         compute_dtype=jnp.float32) -> jnp.ndarray:
    """k x (argmax + one-hot matmul): exact k-NN feature max on the MXU."""
    sim = _similarity(x, compute_dtype)                    # (B, N, N)
    xc = x.astype(compute_dtype)
    neg = jnp.float32(-jnp.inf)
    rel = jnp.full_like(x, -jnp.inf)
    for _ in range(k):
        nbr_idx = jnp.argmax(sim, axis=-1)                 # (B, N)
        onehot = jax.nn.one_hot(nbr_idx, sim.shape[-1], dtype=compute_dtype)
        feat = jnp.einsum("bnm,bmc->bnc", onehot, xc,
                          preferred_element_type=jnp.float32)
        rel = jnp.maximum(rel, feat.astype(x.dtype))
        # mask the taken neighbor for the next round
        sim = jnp.where(
            jax.nn.one_hot(nbr_idx, sim.shape[-1], dtype=bool), neg, sim
        )
    return rel


def _max_neighbors_pallas(x, k, compute_dtype=jnp.float32):
    from grafp_tpu.ops.pallas_knn import max_neighbors_pallas

    interpret = jax.default_backend() != "tpu"
    return max_neighbors_pallas(x, k, interpret)


def _max_neighbors_auto(x, k, compute_dtype=jnp.float32):
    if jax.default_backend() == "tpu":
        return _max_neighbors_pallas(x, k, compute_dtype)
    return max_neighbors_onehot(x, k, compute_dtype)


_STRATEGIES = {
    "exact": max_neighbors_exact,
    "approx": max_neighbors_approx,
    "onehot": max_neighbors_onehot,
    "pallas": _max_neighbors_pallas,
    "auto": _max_neighbors_auto,
}


def max_relative_neighbors(
    x: jnp.ndarray, k: int, strategy: str = "onehot",
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """max over the k most-similar nodes (self included) of their
    features, minus nothing - callers subtract x themselves."""
    return _STRATEGIES[strategy](x, k, compute_dtype)
