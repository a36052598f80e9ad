"""Dense k-NN graph construction on TPU.

Capability-equivalent of the reference's gcn_lib graph builder
(encoder/gcn_lib/torch_edge.py): L2-normalize node features along
channels, compute pairwise squared-L2 distances via a matmul, take the
k*dilation nearest (self included - the self distance is 0), then keep
every dilation-th neighbor.

TPU-first formulation: for L2-normalized features,
    -||x_i - x_j||^2 = 2*cos(x_i, x_j) - 2
is a monotone function of the similarity, so nearest-by-distance ==
top-k-by-similarity and the whole op is ONE batched matmul on the MXU
followed by lax.top_k - no x_square broadcast adds, no negation
(reference torch_edge.py:7-18 materializes the x^2+inner+x^2 sum).

The graph is a pure function of stop_gradient(features) (the reference
builds it under torch.no_grad, torch_edge.py:15).

Blockwise mode (block_rows > 0) tiles the query rows through a lax.map,
bounding peak HBM at B*block*N instead of B*N*N - the TPU analogue of the
reference's chunked path for >10k nodes (torch_edge.py:82-94).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """Match torch.nn.functional.normalize: x / max(||x||, eps)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def pairwise_sqdist(x: jnp.ndarray, y: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Squared L2 distances. x (B, N, C), y (B, M, C) -> (B, N, M)."""
    if y is None:
        y = x
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)          # (B, N, 1)
    y2 = jnp.sum(y * y, axis=-1, keepdims=True)          # (B, M, 1)
    inner = jnp.einsum("bnc,bmc->bnm", x, y, preferred_element_type=jnp.float32)
    return x2 - 2.0 * inner + jnp.swapaxes(y2, -1, -2)


def dilate_neighbors(idx: jnp.ndarray, dilation: int) -> jnp.ndarray:
    """Keep every dilation-th neighbor (reference torch_edge.py:252-254).
    idx (..., k*dilation) -> (..., k)."""
    if dilation <= 1:
        return idx
    return idx[..., ::dilation]


@partial(jax.jit, static_argnames=("k", "block_rows", "compute_dtype"))
def knn_graph(
    x: jnp.ndarray,
    k: int,
    block_rows: int = 0,
    compute_dtype: str = "float32",
) -> jnp.ndarray:
    """Indices of the k nearest nodes (by L2 on channel-normalized
    features, self included) for every node.

    Args:
      x: (B, N, C) node features (channels last). Gradients are stopped.
      k: neighbors to return (pass k*dilation then `dilate_neighbors`).
      block_rows: 0 = dense (B,N,N) similarity; >0 = tile query rows.

    Returns:
      (B, N, k) int32 neighbor indices, nearest first.
    """
    x = jax.lax.stop_gradient(x)
    xn = l2_normalize(x, axis=-1).astype(jnp.dtype(compute_dtype))
    b, n, c = xn.shape

    if block_rows and block_rows < n:
        nblk = -(-n // block_rows)
        pad = nblk * block_rows - n
        xq = jnp.pad(xn, ((0, 0), (0, pad), (0, 0)))
        xq = xq.reshape(b, nblk, block_rows, c).transpose(1, 0, 2, 3)

        def one_block(q):                                  # (B, blk, C)
            sim = jnp.einsum("bqc,bmc->bqm", q, xn,
                             preferred_element_type=jnp.float32)
            return jax.lax.top_k(sim, k)[1]

        idx = jax.lax.map(one_block, xq)                   # (nblk, B, blk, k)
        idx = idx.transpose(1, 0, 2, 3).reshape(b, nblk * block_rows, k)
        return idx[:, :n].astype(jnp.int32)

    sim = jnp.einsum("bnc,bmc->bnm", xn, xn,
                     preferred_element_type=jnp.float32)
    return jax.lax.top_k(sim, k)[1].astype(jnp.int32)


def gather_neighbors(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather neighbor features. x (B, N, C), idx (B, N, k) -> (B, N, k, C).

    Equivalent of the reference's batched_index_select
    (gcn_lib/torch_nn.py:79-99) in channels-last layout.
    """
    return jnp.take_along_axis(x[:, :, None, :], idx[..., None], axis=1)
