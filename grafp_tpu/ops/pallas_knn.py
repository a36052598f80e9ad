"""Pallas-fused k-NN max-relative aggregation.

One kernel program per batch item: the (N, N) cosine-similarity matrix
is computed AND consumed entirely in VMEM - the XLA 'onehot' strategy
(ops/mrconv_neighbors.py) round-trips ~2 GB of (B, N, N) scores through
HBM per selection round, which is why the stage-1 Grapher measured
~11 ms despite needing only ~140 GFLOP (scripts/profile_components.py).
Here HBM traffic is just x in / rel out (~0.5 MB per item).

Per round (k rounds, k static):
    rowmax  = max_j scores[i, j]
    mask    = scores == rowmax            (ties: see note)
    feat    = (mask @ x) / rowsum(mask)   -- MXU matmul, VMEM resident
    rel     = max(rel, feat)
    scores  = where(mask, -inf, scores)

Tie note: an exact score tie extracts the MEAN of the tied rows and
consumes one "rank level" for all of them. Ties between *identical*
feature rows (the common real case: duplicated silent nodes) therefore
give exactly the right answer; ties between distinct rows (measure-zero
in float similarities) deviate from take-first semantics.

VMEM budget at the largest stage (N=1024, C=64, f32): scores 4 MB +
mask 4 MB + x/xn/rel 0.75 MB < 16 MB.

Gradients: selection is under stop_gradient but features flow through
the extraction matmul. The custom VJP is a SECOND pallas kernel (not an
XLA onehot recompute, which round-trips the (B, N, N) masks through
HBM): it recomputes scores in VMEM, replays the k selection rounds to
rebuild each round's tie-group mask, picks the winning round per
(node, channel) against the forward's running max, and scatters
g/cnt through transposed mask matmuls - accumulating the (N, C)
cotangent across query tiles in the revisited output block. HBM traffic
is x/xn/g in, dx out; everything quadratic stays in VMEM.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from grafp_tpu.ops.knn import l2_normalize

# query-row tile cap: bounds scores/mask VMEM at ~2*t*n*4 bytes. t=512
# halves the key re-reads vs t=256 and measured ~1.5x faster at the
# N=512 stage (t=1024 at N=1024 OOMs the 16 MB scoped VMEM).
_MAX_TILE = 512


def _tile_rows(n: int) -> int:
    t = min(n, _MAX_TILE)
    while n % t:
        t //= 2
    return t


def _kernel(k: int, rows_ref, xn_ref, x_ref, out_ref):
    rows = rows_ref[0]                                     # (T, C) query rows
    xn = xn_ref[0]                                         # (N, C) keys
    x = x_ref[0]                                           # (N, C) features
    # The extraction matmul runs at the INPUT dtype with f32 accumulation:
    # when x is bf16 this is bit-identical to an f32 matmul (0/1 masks and
    # bf16 values are exact in bf16; the bf16->f32 cast is exact) but runs
    # at the MXU's native bf16 rate instead of the 4-8x slower f32 path.
    mm_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    xmm = x.astype(mm_dtype)
    scores = jnp.dot(rows, xn.T, preferred_element_type=jnp.float32)
    rel = jnp.full((rows.shape[0], x.shape[1]), -jnp.inf, dtype=jnp.float32)
    consumed = jnp.zeros((rows.shape[0], 1), jnp.float32)  # columns taken
    for _ in range(k):
        rowmax = jnp.max(scores, axis=1, keepdims=True)
        mask = scores >= rowmax
        maskf = mask.astype(mm_dtype)
        cnt = jnp.maximum(
            jnp.sum(mask.astype(jnp.float32), axis=1, keepdims=True), 1.0
        )
        feat = jnp.dot(maskf, xmm,
                       preferred_element_type=jnp.float32) / cnt
        # rows whose k-budget is already consumed by earlier tie groups
        # take no further neighbors (keeps top-k semantics under ties)
        active = consumed < k
        rel = jnp.where(active, jnp.maximum(rel, feat), rel)
        consumed = consumed + cnt
        scores = jnp.where(mask, -jnp.inf, scores)
    out_ref[0] = rel.astype(out_ref.dtype)


def _pallas_forward(x: jnp.ndarray, k: int, interpret: bool) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = x.shape
    t = _tile_rows(n)
    xs = jax.lax.stop_gradient(x)
    xn = l2_normalize(xs, axis=-1)
    kern = functools.partial(_kernel, k)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        grid=(b, n // t),
        in_specs=[
            pl.BlockSpec((1, t, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xn, xn, xs)


def _bwd_kernel(k: int, rows_ref, xn_ref, x_ref, g_ref, dx_ref):
    """Cotangent of _kernel w.r.t. the feature input x.

    Forward (per round r): feat_r = mask_r @ x / cnt_r;
    rel = where(active_r, max(rel, feat_r), rel). The winning round
    r*(n, c) therefore receives g[n, c], and through the extraction
    matmul dx += mask_r^T @ (g * win_r / cnt_r). Tie groups split the
    gradient equally (the true gradient of the mean); winner equality
    uses the EXACT stored forward feat values, so it is bit-safe.
    """
    import jax.experimental.pallas as pl

    rows = rows_ref[0]                                     # (T, C)
    xn = xn_ref[0]                                         # (N, C)
    x = x_ref[0]                                           # (N, C)
    g = g_ref[0].astype(jnp.float32)                       # (T, C)
    # Replay matmuls MUST match the forward kernel's dtype bit-exactly
    # (the winner test below compares replayed feats against the
    # forward's running max), so mirror _kernel's mm_dtype choice.
    mm_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    xmm = x.astype(mm_dtype)
    scores = jnp.dot(rows, xn.T, preferred_element_type=jnp.float32)

    # pass 1: replay the forward rounds, keeping each round's feat/cnt
    rel = jnp.full((rows.shape[0], x.shape[1]), -jnp.inf, jnp.float32)
    consumed = jnp.zeros((rows.shape[0], 1), jnp.float32)
    s = scores
    feats, cnts, actives = [], [], []
    for _ in range(k):
        rowmax = jnp.max(s, axis=1, keepdims=True)
        mask = s >= rowmax
        maskf = mask.astype(mm_dtype)
        cnt = jnp.maximum(
            jnp.sum(mask.astype(jnp.float32), axis=1, keepdims=True), 1.0
        )
        feat = jnp.dot(maskf, xmm, preferred_element_type=jnp.float32) / cnt
        active = consumed < k
        rel = jnp.where(active, jnp.maximum(rel, feat), rel)
        consumed = consumed + cnt
        feats.append(feat)
        cnts.append(cnt)
        actives.append(active)
        s = jnp.where(mask, -jnp.inf, s)

    # pass 2: rebuild each round's mask (scores replay, no extra matmul)
    # and scatter the winner's gradient through mask^T
    claimed = jnp.zeros_like(rel, dtype=jnp.bool_)
    acc = jnp.zeros((x.shape[0], x.shape[1]), jnp.float32)
    s = scores
    for r in range(k):
        rowmax = jnp.max(s, axis=1, keepdims=True)
        mask = s >= rowmax
        maskf = mask.astype(mm_dtype)
        win = actives[r] & (feats[r] == rel) & ~claimed
        claimed = claimed | win
        gr = (jnp.where(win, g, 0.0) / cnts[r]).astype(mm_dtype)
        acc = acc + jnp.dot(maskf.T, gr,
                            preferred_element_type=jnp.float32)
        s = jnp.where(mask, -jnp.inf, s)

    # query tiles j revisit the same (N, C) output block: init then add
    @pl.when(pl.program_id(1) == 0)
    def _init():
        dx_ref[0] = acc.astype(dx_ref.dtype)

    @pl.when(pl.program_id(1) != 0)
    def _accum():
        dx_ref[0] = dx_ref[0] + acc.astype(dx_ref.dtype)


def _pallas_backward(x: jnp.ndarray, g: jnp.ndarray, k: int,
                     interpret: bool) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = x.shape
    t = _tile_rows(n)
    xs = jax.lax.stop_gradient(x)
    xn = l2_normalize(xs, axis=-1)
    kern = functools.partial(_bwd_kernel, k)
    dx = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, n, c), jnp.float32),
        grid=(b, n // t),
        in_specs=[
            pl.BlockSpec((1, t, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xn, xn, xs, g)
    return dx.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def max_neighbors_pallas(x: jnp.ndarray, k: int,
                         interpret: bool = False) -> jnp.ndarray:
    """max over the k most-similar nodes' features, fused in VMEM."""
    return _pallas_forward(x, k, interpret)


def _fwd(x, k, interpret):
    return _pallas_forward(x, k, interpret), x


def _bwd(k, interpret, x, g):
    return (_pallas_backward(x, g, k, interpret),)


max_neighbors_pallas.defvjp(_fwd, _bwd)
