"""Pallas-fused k-NN max-relative aggregation.

The (N, N) cosine-similarity matrix is computed AND consumed entirely
in VMEM - the XLA 'onehot' strategy (ops/mrconv_neighbors.py)
round-trips ~2 GB of (B, N, N) scores through HBM per selection round,
which is why the stage-1 Grapher measured ~11 ms despite needing only
~140 GFLOP (scripts/profile_components.py). Here HBM traffic is just
x in / rel out (~0.5 MB per item).

Two entry points:
  * max_neighbors_pallas(x, k) -> rel (B, N, C): drop-in for the other
    mrconv_neighbors strategies (keys pre-normalized by XLA).
  * mrconv_concat_pallas(x, k) -> (B, N, 2C) = [x || rel - x]: the
    production Grapher path. Takes RAW x as its ONLY input; key
    normalization (f32), selection, neighbor max, subtract and channel
    concat all happen in VMEM, because the pallas boundary is a fusion
    barrier - the standalone variant forces XLA to materialize
    normalize/rel/rel-x/interleave (~1.6 MB/item per Grapher block),
    which both cost HBM passes and CAUSED the B>=256 throughput
    anti-scaling (those tensors outgrew VMEM residency). The channel
    interleave the MRConv grouped conv expects is absorbed into the
    conv's weight permutation (models/layers.py:grouped_as_concat_dense).

Selection (k static rounds, immutable scores): round r's tie-group is
{s : s >= rowmax_r and s < rowmax_{r-1}} - equivalent to the classic
"mask taken entries to -inf and re-max" (the row max strictly decreases)
but never rewrites scores, so extraction can be deferred and all k
rounds share ONE (k*T, N) @ (N, C) MXU matmul. Extraction runs at the
INPUT dtype with f32 accumulation: for bf16 models this is bit-identical
to f32 extraction (0/1 masks and bf16 values are exact; the bf16->f32
cast is exact) at the MXU's native bf16 rate.

Tie note: an exact score tie extracts the MEAN of the tied rows and
consumes one "rank level" for all of them. Ties between *identical*
feature rows (the common real case: duplicated silent nodes) therefore
give exactly the right answer; ties between distinct rows (measure-zero
in float similarities) deviate from take-first semantics.

Tiling: bf16 row tiles up to t=1024 (scores 4 MB f32 + k bf16 masks
6 MB < 16 MB scoped VMEM); f32 tiles cap at 512. When one program
covers a full item, multiple batch items are packed per program
(~_PACK_ROWS rows) to amortize the ~1-2 us per-program fixed cost that
otherwise dominates the small-N stages.

Gradients: selection is under stop_gradient but features flow through
the extraction matmul. The custom VJP is a SECOND pallas kernel (not an
XLA onehot recompute): it replays the selection (bit-identical feats),
picks the winning round per (node, channel) against the forward's
running max, and scatters all rounds' g/cnt through ONE transposed
matmul mstack^T @ gstack, accumulating the (N, C) cotangent across
query tiles in the revisited output block. The concat variant adds the
direct term g_x - g_rel to its own row tile. HBM traffic is x/g in,
dx out; everything quadratic stays in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from grafp_tpu.ops.knn import l2_normalize

# query-row tile cap: bounds scores/mask VMEM at ~t*n*(4+2k) bytes.
# bf16 inputs afford t=1024 at N=1024 (scores 4 MB f32 + k bf16 masks
# 6 MB < 16 MB scoped VMEM), which halves per-program overhead and key
# re-reads vs t=512; f32 masks need t<=512.
_MAX_TILE_BF16 = 1024
_MAX_TILE_F32 = 512

# Per-program fixed cost (~1-2 us: grid step, DMA setup) dominates when
# N is small - at N=256 the per-item kernel work is ~0.7 us of MXU time
# but measured 3.4 us with one item per program. Pack items so each
# program sees ~_PACK_ROWS query rows, bounded by a VMEM estimate.
_PACK_ROWS = 1024
_VMEM_ITEM_BUDGET = 12 * (1 << 20)


def _tile_rows(n: int, dtype) -> int:
    cap = _MAX_TILE_BF16 if dtype == jnp.bfloat16 else _MAX_TILE_F32
    t = min(n, cap)
    while n % t:
        t //= 2
    return t


def _items_per_block(b: int, n: int, c: int, k: int, dtype,
                     backward: bool) -> int:
    """Items packed per kernel program: ~_PACK_ROWS rows per program,
    capped so the per-item VMEM working set fits the scoped budget.
    Packing only applies when one program covers a full item (t == n).

    The per-item estimate is itemized (round-3 fix): the old lumped
    (4k+8)*n*c*4 figure was ~3x the real working set, which silently
    disabled packing at the small-N stages - where per-program fixed
    cost (~1-2 us vs ~0.7 us of MXU work at N=256) is exactly what
    packing exists to amortize.
      f32: scores 4nn, feats k, rel 1, row norms 2   (x n*c*4)
      dtype: in block x2 (double-buffered), out 2C x2, concat/diff ~2
    """
    ms = 2 if dtype == jnp.bfloat16 else 4
    per = ((4 + k * ms) * n * n            # scores + k masks
           + (k + 3) * n * c * 4           # feats stack, rel, norms
           + 8 * n * c * ms)               # in/out blocks (db), temps
    if backward:
        per += (2 * k + 2) * n * c * 4
    bb = max(1, min(_PACK_ROWS // n, _VMEM_ITEM_BUDGET // per))
    while b % bb:
        bb -= 1
    return max(bb, 1)


def _select_rounds(scores, k: int, mm_dtype):
    """k selection rounds on an immutable score matrix.

    Round r's tie-group is {s : s >= rowmax_r and s < rowmax_{r-1}} -
    thresholding against the previous round's max is equivalent to the
    classic "set taken entries to -inf and re-max" formulation (the max
    strictly decreases each round) but never rewrites the score matrix,
    and it leaves extraction to the caller so all k rounds can share ONE
    MXU matmul. Returns (masks in mm_dtype, f32 tie counts).
    """
    t = scores.shape[0]
    thresh = jnp.full((t, 1), jnp.inf, jnp.float32)
    masks, cnts = [], []
    for _ in range(k):
        live = scores < thresh
        rowmax = jnp.max(jnp.where(live, scores, -jnp.inf),
                         axis=1, keepdims=True)
        mask = live & (scores >= rowmax)
        masks.append(mask.astype(mm_dtype))
        cnts.append(jnp.maximum(
            jnp.sum(mask.astype(jnp.float32), axis=1, keepdims=True), 1.0
        ))
        thresh = rowmax
    return masks, cnts


def _one_forward(k: int, rows, xn, x):
    # The extraction matmul runs at the INPUT dtype with f32 accumulation:
    # when x is bf16 this is bit-identical to an f32 matmul (0/1 masks and
    # bf16 values are exact in bf16; the bf16->f32 cast is exact) but runs
    # at the MXU's native bf16 rate instead of the 4-8x slower f32 path.
    mm_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    xmm = x.astype(mm_dtype)
    t, c = rows.shape[0], x.shape[1]
    scores = jnp.dot(rows, xn.T, preferred_element_type=jnp.float32)
    masks, cnts = _select_rounds(scores, k, mm_dtype)
    # ONE extraction matmul for all k rounds: (k*T, N) @ (N, C); row
    # blocks are independent, so each feat is bit-identical to its own
    # (T, N) @ (N, C) matmul
    feats = jnp.dot(jnp.concatenate(masks, axis=0), xmm,
                    preferred_element_type=jnp.float32)    # (k*T, C)
    rel = jnp.full((t, c), -jnp.inf, dtype=jnp.float32)
    consumed = jnp.zeros((t, 1), jnp.float32)              # columns taken
    for r in range(k):
        feat = feats[r * t:(r + 1) * t] / cnts[r]
        # rows whose k-budget is already consumed by earlier tie groups
        # take no further neighbors (keeps top-k semantics under ties)
        active = consumed < k
        rel = jnp.where(active, jnp.maximum(rel, feat), rel)
        consumed = consumed + cnts[r]
    return rel


def _kernel(k: int, bb: int, rows_ref, xn_ref, x_ref, out_ref):
    for ii in range(bb):                                   # static unroll
        rel = _one_forward(k, rows_ref[ii], xn_ref[ii], x_ref[ii])
        out_ref[ii] = rel.astype(out_ref.dtype)


def _pallas_forward(x: jnp.ndarray, k: int, interpret: bool) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = x.shape
    # N >= k precondition (shapes are static): _select_rounds' threshold
    # formulation assumes a row never exhausts all N columns with budget
    # remaining - when N < k the classic mask-to--inf selection would
    # re-pick every column while this one picks none and would inject a
    # spurious 0 into the running max. Unreachable for the model (N is
    # 128..1024, k=3); refuse rather than silently deviate.
    assert n >= k, f"pallas kNN requires N >= k (got N={n}, k={k})"
    t = _tile_rows(n, x.dtype)
    bb = 1 if t < n else _items_per_block(b, n, c, k, x.dtype, False)
    xs = jax.lax.stop_gradient(x)
    xn = l2_normalize(xs, axis=-1)
    kern = functools.partial(_kernel, k, bb)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        grid=(b // bb, n // t),
        in_specs=[
            pl.BlockSpec((bb, t, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, t, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xn, xn, xs)


def _one_backward(k: int, rows, xn, x, g):
    """Cotangent of _one_forward w.r.t. the feature input x.

    Forward (per round r): feat_r = mask_r @ x / cnt_r;
    rel = where(active_r, max(rel, feat_r), rel). The winning round
    r*(n, c) therefore receives g[n, c], and through the extraction
    matmul dx += mask_r^T @ (g * win_r / cnt_r). Tie groups split the
    gradient equally (the true gradient of the mean); winner equality
    uses the EXACT stored forward feat values, so it is bit-safe.
    """
    g = g.astype(jnp.float32)                              # (T, C)
    # Replay matmuls MUST match the forward kernel's dtype bit-exactly
    # (the winner test below compares replayed feats against the
    # forward's running max), so mirror _one_forward's mm_dtype choice.
    mm_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    xmm = x.astype(mm_dtype)
    t = rows.shape[0]
    scores = jnp.dot(rows, xn.T, preferred_element_type=jnp.float32)

    # pass 1: replay the forward (same shared extraction matmul as
    # _one_forward, so feat values match bit-for-bit), keeping masks/cnts
    masks, cnts = _select_rounds(scores, k, mm_dtype)
    mstack = jnp.concatenate(masks, axis=0)                # (k*T, N)
    fstack = jnp.dot(mstack, xmm,
                     preferred_element_type=jnp.float32)   # (k*T, C)
    rel = jnp.full((t, x.shape[1]), -jnp.inf, jnp.float32)
    consumed = jnp.zeros((t, 1), jnp.float32)
    feats, actives = [], []
    for r in range(k):
        feat = fstack[r * t:(r + 1) * t] / cnts[r]
        active = consumed < k
        rel = jnp.where(active, jnp.maximum(rel, feat), rel)
        consumed = consumed + cnts[r]
        feats.append(feat)
        actives.append(active)

    # pass 2: pick each (node, channel)'s winning round against the
    # forward's running max and scatter all rounds' gradients through
    # ONE transposed matmul: dx = sum_r mask_r^T @ g_r = mstack^T @ gstack
    claimed = jnp.zeros_like(rel, dtype=jnp.bool_)
    grs = []
    for r in range(k):
        win = actives[r] & (feats[r] == rel) & ~claimed
        claimed = claimed | win
        # DELIBERATE precision trade (unlike the forward's bit-exact
        # 0/1-mask argument): arbitrary cotangent values are quantized
        # to bf16 here when the model runs bf16, keeping the scatter
        # matmul on the MXU's native bf16 path. Training in bf16 is
        # loss-equivalent end-to-end (scripts/bf16_train_study.py:
        # 60-step trajectories deviate 1.65% mean / 0.6% final), and
        # the quantization is regression-guarded by
        # tests/test_pallas_knn.py::test_bf16_backward_close_to_f32.
        grs.append((jnp.where(win, g, 0.0) / cnts[r]).astype(mm_dtype))
    return jax.lax.dot_general(
        mstack, jnp.concatenate(grs, axis=0),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # (N, C)


def _bwd_kernel(k: int, bb: int, rows_ref, xn_ref, x_ref, g_ref, dx_ref):
    import jax.experimental.pallas as pl

    for ii in range(bb):                                   # static unroll
        acc = _one_backward(k, rows_ref[ii], xn_ref[ii], x_ref[ii],
                            g_ref[ii])

        # query tiles j revisit the same (N, C) output block: init + add
        @pl.when(pl.program_id(1) == 0)
        def _init(ii=ii, acc=acc):
            dx_ref[ii] = acc.astype(dx_ref.dtype)

        @pl.when(pl.program_id(1) != 0)
        def _accum(ii=ii, acc=acc):
            dx_ref[ii] = dx_ref[ii] + acc.astype(dx_ref.dtype)


def _pallas_backward(x: jnp.ndarray, g: jnp.ndarray, k: int,
                     interpret: bool) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = x.shape
    t = _tile_rows(n, x.dtype)
    bb = 1 if t < n else _items_per_block(b, n, c, k, x.dtype, True)
    xs = jax.lax.stop_gradient(x)
    xn = l2_normalize(xs, axis=-1)
    kern = functools.partial(_bwd_kernel, k, bb)
    dx = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, n, c), jnp.float32),
        grid=(b // bb, n // t),
        in_specs=[
            pl.BlockSpec((bb, t, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, t, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, n, c), lambda i, j: (i, 0, 0),
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


# ---------------------------------------------------------------------------
# Fully-fused MRConv frontend: x -> [x || max_k(x_nbr) - x] (concat layout)
# ---------------------------------------------------------------------------
#
# The pallas call is a fusion barrier for XLA, so the standalone kernel
# forces HBM materialization of l2_normalize(x), three kernel input
# reads, rel, rel - x, and the channel interleave - ~1.6 MB/item of
# boundary traffic per Grapher block (x12 blocks). This variant takes
# RAW x as its only input, normalizes keys in VMEM, and emits the
# concatenated [x || rel - x] tensor the MRConv conv consumes directly
# (the interleave lives in the conv's weight permutation - see
# models/layers.py:grouped_as_concat_dense). Keys are normalized in f32
# (more accurate than the XLA bf16 l2_normalize of the standalone path).


def _norm_rows_f32(x):
    x32 = x.astype(jnp.float32)
    n = jnp.sqrt(jnp.sum(x32 * x32, axis=-1, keepdims=True))
    return x32 / jnp.maximum(n, 1e-12)


def _concat_kernel(k: int, bb: int, x_ref, rows_ref, out_ref):
    # rows_ref is the RAW row tile (a separate input block, not a
    # dynamic slice of the keys: Mosaic has no value-domain
    # dynamic_slice). Normalization is row-wise, so normalizing the
    # tile independently is bit-identical to slicing normalized keys.
    for ii in range(bb):                                   # static unroll
        x = x_ref[ii]                                      # (N, C) raw keys
        xt = rows_ref[ii]                                  # (T, C) raw rows
        mm_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
        xn = _norm_rows_f32(x).astype(mm_dtype)
        rows = _norm_rows_f32(xt).astype(mm_dtype)
        rel = _one_forward(k, rows, xn, x)                 # (T, C) f32
        # rel - x in the INPUT dtype, matching the unfused path's
        # `max_relative_neighbors(...).astype(x.dtype) - x`
        diff = rel.astype(x.dtype) - xt
        out_ref[ii] = jnp.concatenate(
            [xt, diff], axis=-1
        ).astype(out_ref.dtype)


def _concat_forward(x: jnp.ndarray, k: int, interpret: bool) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = x.shape
    assert n >= k, f"pallas kNN requires N >= k (got N={n}, k={k})"  # see _pallas_forward
    t = _tile_rows(n, x.dtype)
    bb = 1 if t < n else _items_per_block(b, n, c, k, x.dtype, False)
    kern = functools.partial(_concat_kernel, k, bb)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, n, 2 * c), x.dtype),
        grid=(b // bb, n // t),
        in_specs=[
            pl.BlockSpec((bb, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, t, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, t, 2 * c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, x)


def _concat_bwd_kernel(k: int, bb: int, t: int, x_ref, rows_ref, g_ref,
                       dx_ref):
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    for ii in range(bb):                                   # static unroll
        x = x_ref[ii]                                      # (N, C)
        xt = rows_ref[ii]                                  # (T, C) raw rows
        g = g_ref[ii]                                      # (T, 2C)
        c = x.shape[1]
        mm_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
        xn = _norm_rows_f32(x).astype(mm_dtype)
        rows = _norm_rows_f32(xt).astype(mm_dtype)
        g_x = g[:, :c].astype(jnp.float32)
        g_rel = g[:, c:].astype(jnp.float32)
        # y = [x || rel(x) - x]  =>  dx = g_x - g_rel + scatter^T(g_rel)
        acc = _one_backward(k, rows, xn, x, g_rel)         # (N, C) f32

        @pl.when(j == 0)
        def _init(ii=ii, acc=acc):
            dx_ref[ii] = acc.astype(dx_ref.dtype)

        @pl.when(j != 0)
        def _accum(ii=ii, acc=acc):
            dx_ref[ii] = dx_ref[ii] + acc.astype(dx_ref.dtype)

        direct = (g_x - g_rel).astype(dx_ref.dtype)
        n = x.shape[0]
        if t == n:
            dx_ref[ii] = dx_ref[ii] + direct
        else:
            dx_ref[ii, pl.ds(j * t, t), :] = (
                dx_ref[ii, pl.ds(j * t, t), :] + direct
            )


def _concat_backward(x: jnp.ndarray, g: jnp.ndarray, k: int,
                     interpret: bool) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = x.shape
    t = _tile_rows(n, x.dtype)
    bb = 1 if t < n else _items_per_block(b, n, c, k, x.dtype, True)
    kern = functools.partial(_concat_bwd_kernel, k, bb, t)
    xs = jax.lax.stop_gradient(x)
    dx = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, n, c), jnp.float32),
        grid=(b // bb, n // t),
        in_specs=[
            pl.BlockSpec((bb, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, t, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, t, 2 * c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, n, c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xs, xs, g)
    return dx.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def mrconv_concat_pallas(x: jnp.ndarray, k: int,
                         interpret: bool = False) -> jnp.ndarray:
    """Fused MRConv frontend: (B, N, C) -> (B, N, 2C) = [x || rel - x],
    where rel = max over the k most-similar nodes' features. Concat
    (not interleaved) channel layout; consume with a conv whose weights
    absorb the interleave permutation (layers.grouped_as_concat_dense)."""
    return _concat_forward(x, k, interpret)


def _concat_fwd(x, k, interpret):
    return _concat_forward(x, k, interpret), x


def _concat_bwd(k, interpret, x, g):
    return (_concat_backward(x, g, k, interpret),)


mrconv_concat_pallas.defvjp(_concat_fwd, _concat_bwd)


# ---------------------------------------------------------------------------
# Whole-Grapher serving kernel: fc1+BN -> kNN+MRConv+BN+relu -> fc2+BN -> +x
# ---------------------------------------------------------------------------
#
# Round-3 per-stage profile (scripts/profile_forward_stages.py, v5e,
# B=128): stage 1 runs at 28% MFU and stage 3 at 61% even with the
# fused MRConv frontend - the time is in the XLA-side fc/BN/conv passes
# AROUND the kernel (every pallas boundary forces the (N, 2C) concat
# tensor and its conv/BN/relu/fc2 successors through HBM). For eval the
# three BatchNorms are plain affines, so the ENTIRE Grapher block
# (models/gnn.py:Grapher, reference torch_vertex.py:142-194) folds into
# one kernel whose only HBM traffic is x in / out (N, C) out - one read
# and one write per block instead of ~6 passes.
#
# The caller pre-folds each BN into its producing linear (w*s, b*s+t -
# same algebra as models/fold_bn.py) and passes bf16 weights + f32 bias
# rows. Inside the kernel every matmul accumulates in f32 on the MXU;
# x1 is cast back to the input dtype before key normalization so
# neighbor selection sees (numerically) the same features as the
# unfused path. Serving only: there is NO VJP (training keeps the
# mrconv_concat_pallas custom-VJP path with live batch stats).


def _grapher_kernel(k: int, bb: int, n: int, x_ref, w1_ref, c1_ref, wg_ref,
                    cg_ref, w2_ref, c2_ref, out_ref):
    w1, wg, w2 = w1_ref[...], wg_ref[...], w2_ref[...]
    c1, cg, c2 = c1_ref[...], cg_ref[...], c2_ref[...]
    c = w1.shape[0]
    # the three fc/conv matmuls run once over ALL packed items' rows
    # (bb*N) - per-item matmuls at these row counts are MXU
    # pipeline-latency bound; only the kNN selection is per-item
    xf = x_ref[...].reshape(bb * n, c)                     # (bb*N, C)
    # fc1 + folded BN (f32 accumulate, then the input dtype - the
    # unfused path's fc1/BN also emit the compute dtype)
    x1 = jnp.dot(xf, w1, preferred_element_type=jnp.float32) + c1
    x1 = x1.astype(xf.dtype)                               # (bb*N, C)
    mm_dtype = xf.dtype if xf.dtype == jnp.bfloat16 else jnp.float32
    rels = []
    for ii in range(bb):                                   # static unroll
        x1i = x1[ii * n:(ii + 1) * n]                      # (N, C)
        xn = _norm_rows_f32(x1i).astype(mm_dtype)
        rels.append(_one_forward(k, xn, xn, x1i))          # (N, C) f32
    rel = jnp.concatenate(rels, axis=0) if bb > 1 else rels[0]
    concat = jnp.concatenate([x1, rel.astype(xf.dtype) - x1],
                             axis=-1)                      # (bb*N, 2C)
    # MRConv grouped conv (dense-expanded, interleave absorbed) +
    # folded BN + relu
    g = jnp.dot(concat, wg, preferred_element_type=jnp.float32) + cg
    g = jnp.maximum(g, 0.0).astype(xf.dtype)               # (bb*N, 2C)
    # fc2 + folded BN + residual
    y = jnp.dot(g, w2, preferred_element_type=jnp.float32) + c2
    out = (y + xf.astype(jnp.float32)).astype(out_ref.dtype)
    out_ref[...] = out.reshape(bb, n, c)


def _grapher_vmem_estimate(n: int, c: int, k: int, dtype) -> tuple[int, int]:
    """(per-item working set, weight-block bytes) for the fused block."""
    ms = 2 if dtype == jnp.bfloat16 else 4
    # scores f32 + k masks + feats stack + x/x1/xn/concat/g/out rows
    per = 4 * n * n + k * ms * n * n + (4 * k + 24) * n * c * 4
    w_bytes = 7 * c * c * ms + 16 * c
    return per, w_bytes


# Support guard for the fused Grapher block, in ESTIMATE scale (the
# itemized estimate overstates Mosaic's true working set by ~25%): the
# largest measured-good shape is stage 1 (N=1024, C=64, k=3, bf16) at
# ~20.0 MB estimated vs the 16 MB scoped VMEM it demonstrably fits.
# Shapes estimating past this envelope (e.g. C>=1024 stems) fall back
# to the unfused path instead of failing at Mosaic compile time.
_GRAPHER_VMEM_GUARD = 21 * (1 << 20)


def grapher_block_supported(n: int, c: int, dtype, k: int = 3) -> bool:
    """The fused block needs one row tile per item (fc1/normalize run on
    the full key set inside one program), N >= k rows, and ONE item's
    working set plus the 7*C^2 weight blocks inside the calibrated VMEM
    envelope — otherwise bb=1 would still fail at Mosaic compile time
    instead of falling back to the unfused path (ADVICE r3)."""
    per, w_bytes = _grapher_vmem_estimate(n, c, k, dtype)
    return (_tile_rows(n, dtype) == n
            and per + w_bytes <= _GRAPHER_VMEM_GUARD)


def _grapher_items_per_block(b: int, n: int, c: int, k: int, dtype) -> int:
    per, w_bytes = _grapher_vmem_estimate(n, c, k, dtype)
    bb = max(1, min(_PACK_ROWS // n,
                    max(_VMEM_ITEM_BUDGET - w_bytes, per) // per))
    while b % bb:
        bb -= 1
    return max(bb, 1)


def grapher_block_pallas(x: jnp.ndarray, k: int,
                         w1, c1, wg, cg, w2, c2,
                         interpret: bool = False) -> jnp.ndarray:
    """One Grapher block, eval mode: (B, N, C) -> (B, N, C).

    w1 (C, C), wg (2C, 2C), w2 (2C, C): BN-folded matmul weights in the
    compute dtype; c1 (1, C), cg (1, 2C), c2 (1, C): f32 bias rows.
    No VJP - differentiating through this raises; training uses the
    unfused path.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = x.shape
    assert n >= k, f"pallas kNN requires N >= k (got N={n}, k={k})"
    assert grapher_block_supported(n, c, x.dtype, k=k), (n, c, k, x.dtype)
    bb = _grapher_items_per_block(b, n, c, k, x.dtype)
    kern = functools.partial(_grapher_kernel, k, bb, n)
    full = lambda i: (0, 0)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * c, 2 * c), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * c), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * c, c), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), full, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, w1, c1, wg, cg, w2, c2)
