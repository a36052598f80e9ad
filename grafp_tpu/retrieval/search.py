"""On-TPU exact nearest-neighbor search.

Replaces the reference's FAISS IndexFlatL2 path (eval.py:54,206-216,
269-270) with distance matmuls on the MXU: for a query block Q and a
fingerprint database DB, squared-L2 distances are
    ||q||^2 - 2 q.DBt + ||db||^2
i.e. ONE (Q, d) x (d, M) matmul plus rank-1 corrections, followed by
lax.top_k. Fingerprints are L2-normalized 128-d vectors, so d=128 packs
exactly one MXU lane tile.

Scaling over the DB axis (the project's analogue of context/sequence
parallelism, SURVEY.md §2.4): `exact_topk_sharded` shard_maps the DB rows
over the mesh's 'db' axis - each chip scores its shard and takes a local
top-k, the (ndev*k) candidates are all-gathered over ICI and merged with
a second top-k. Peak memory per chip is Q*M/ndev scores; the gather is
k*ndev per query, independent of M.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from grafp_tpu.core.mesh import DB_AXIS

# Rows per on-device scored block, shared by the index family and the
# streaming scan. Empirical v5e constraint: 256k-row f32 blocks hit a
# ~100x pathological slow path; keep blocks >= 1M rows (CLAUDE.md
# shape-pathology (a)).
DB_BLOCK_ROWS = 1 << 20


def _sq_norms(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(jnp.square(x), axis=-1)


def _topk_dist(
    q: jnp.ndarray,
    db: jnp.ndarray,
    k: int,
    db_sq: Optional[jnp.ndarray] = None,
    metric: str = "l2",
    compute_dtype=jnp.float32,
    n_valid: Optional[jnp.ndarray] = None,
    scan_topk: str = "exact",
    recall_target: float = 0.99,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense block scorer. Returns (scores, ids); scores are squared-L2
    distances (ascending-best) for 'l2', inner products (descending-best
    returned as-is) for 'ip'. Rows at index >= n_valid (zero padding)
    are masked to worst-possible BEFORE selection - masking after top-k
    would let pad rows crowd real candidates out of the block top-k.

    scan_topk='approx' selects with lax.approx_max_k at recall_target
    per neighbor instead of exact lax.top_k - selection, not the
    matmul, dominates block scoring on v5e (masked_scan_search note)."""
    def _select(maxables, k):
        if scan_topk == "approx" and k < maxables.shape[-1]:
            return jax.lax.approx_max_k(maxables, k,
                                        recall_target=recall_target)
        return jax.lax.top_k(maxables, k)
    inner = jnp.matmul(
        q.astype(compute_dtype), db.T.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    pad_mask = None
    if n_valid is not None:
        pad_mask = jnp.arange(db.shape[0])[None, :] >= n_valid
    if metric == "ip":
        if pad_mask is not None:
            inner = jnp.where(pad_mask, -jnp.inf, inner)
        s, i = _select(inner, k)
        return s, i
    if db_sq is None:
        db_sq = _sq_norms(db)
    dist = _sq_norms(q)[:, None] - 2.0 * inner + db_sq[None, :]
    if pad_mask is not None:
        dist = jnp.where(pad_mask, jnp.inf, dist)
    s, i = _select(-dist, k)
    return -s, i


@functools.partial(jax.jit, static_argnames=("k", "recall_target"))
def approx_topk_ip(
    q: jnp.ndarray,
    db: jnp.ndarray,
    k: int,
    recall_target: float = 0.95,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Low-latency serving search: inner-product top-k via the TPU's
    partial-reduction approx_max_k. For L2-normalized fingerprints the
    inner-product ranking equals the L2 ranking; measured ~2x lower p50
    than the exact scan on a 7M-row DB (31 vs 61 ms for a 19-segment
    sequence). Per-neighbor recall ~recall_target."""
    inner = jnp.matmul(q, db.T, preferred_element_type=jnp.float32)
    return jax.lax.approx_max_k(inner, k, recall_target=recall_target)


@functools.partial(jax.jit, static_argnames=("k", "metric", "block_rows"))
def exact_topk(
    q: jnp.ndarray,
    db: jnp.ndarray,
    k: int,
    metric: str = "l2",
    block_rows: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-device exact top-k. q (Q, d), db (M, d) -> (Q, k) scores/ids.

    block_rows > 0 tiles the DB rows through a scan, keeping peak memory
    at Q*block_rows while merging a running top-k (for DBs whose full
    (Q, M) score matrix would not fit).
    """
    if block_rows and block_rows < db.shape[0]:
        m = db.shape[0]
        nblk = -(-m // block_rows)
        pad = nblk * block_rows - m
        db_p = jnp.pad(db, ((0, pad), (0, 0)))
        valid = jnp.arange(nblk * block_rows) < m
        db_blocks = db_p.reshape(nblk, block_rows, -1)
        worst = jnp.inf if metric == "l2" else -jnp.inf
        kk = min(k, block_rows)

        def body(carry, blk):
            best_s, best_i = carry
            rows, base = blk
            s, i = _topk_dist(q, rows, kk, metric=metric,
                              n_valid=m - base)  # pre-mask padded rows
            i = i + base
            cat_s = jnp.concatenate([best_s, s], axis=1)
            cat_i = jnp.concatenate([best_i, i], axis=1)
            sign = -1.0 if metric == "l2" else 1.0
            ns, sel = jax.lax.top_k(sign * cat_s, k)
            return (sign * ns, jnp.take_along_axis(cat_i, sel, 1)), None

        init_s = jnp.full((q.shape[0], k), worst)
        init_i = jnp.zeros((q.shape[0], k), jnp.int32)
        bases = jnp.arange(nblk) * block_rows
        (s, i), _ = jax.lax.scan(body, (init_s, init_i), (db_blocks, bases))
        return s, i

    return _topk_dist(q, db, k, metric=metric)


def _masked_scan_local(
    q: jnp.ndarray,           # (Q, d) float32
    rows_or_codes: jnp.ndarray,  # (Ml, d) rows or (Ml, n_sub) uint8 codes
    codebooks,                # (n_sub, ksub, dsub) when has_codes
    cells,                    # (Ml,) int32 cell ids (when has_cells)
    member,                   # (Q, nlist) bool probe membership
    id_base,                  # scalar: global row id of local row 0
    m_valid: jnp.ndarray,     # scalar: true GLOBAL row count
    k: int,
    block: int,
    has_cells: bool = False,
    has_codes: bool = False,
    scan_topk: str = "exact",
    recall_target: float = 0.99,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scan body shared by the single-chip and 'db'-sharded engines:
    (decode ->) distance matmul -> IVF probe masking -> running top-k
    merge over the LOCAL rows, emitting GLOBAL ids (id_base offset)."""
    mp = rows_or_codes.shape[0]
    assert mp % block == 0, (
        f"rows ({mp}) must be pre-padded to a multiple of block ({block})"
    )
    nblk = mp // block
    kk = min(k, block)
    q2 = jnp.sum(q * q, axis=1, keepdims=True)

    row_blocks = rows_or_codes.reshape(nblk, block, -1)
    cell_blocks = (cells.reshape(nblk, block) if has_cells
                   else jnp.zeros((nblk, 1), jnp.int32))
    bases = id_base + jnp.arange(nblk) * block

    def body(carry, inp):
        best_s, best_i = carry
        blk, blk_cells, base = inp
        if has_codes:
            # per-subspace (dsub, M)-layout gather - see pq.decode for
            # why other gather layouts blow up on TPU tiling
            rec = jax.vmap(
                lambda cb_s, c_s: cb_s.T[:, c_s], in_axes=(0, 1), out_axes=0
            )(codebooks, blk.astype(jnp.int32))             # (S, dsub, blk)
            rows = jnp.transpose(rec, (2, 0, 1)).reshape(block, -1)
        else:
            rows = blk
        rows = rows.astype(jnp.float32)  # rows may be a bf16 decode cache
        inner = jnp.matmul(q, rows.T, preferred_element_type=jnp.float32)
        dist = q2 - 2.0 * inner + jnp.sum(rows * rows, axis=1)[None, :]
        ids = base + jnp.arange(block)
        dist = jnp.where((ids >= m_valid)[None, :], jnp.inf, dist)
        if has_cells:
            # probe mask as a one-hot matmul (MXU) - a (Q, block) index
            # gather measured ~100x slower at 7M rows
            onehot = jax.nn.one_hot(blk_cells, member.shape[1],
                                    dtype=jnp.float32)      # (block, nlist)
            ok = jnp.matmul(member.astype(jnp.float32), onehot.T,
                            preferred_element_type=jnp.float32) > 0.5
            dist = jnp.where(ok, dist, jnp.inf)
        if scan_topk == "approx" and kk < block:
            nd, sel = jax.lax.approx_max_k(-dist, kk,
                                           recall_target=recall_target)
        else:
            nd, sel = jax.lax.top_k(-dist, kk)
        gids = ids[sel]
        cat_s = jnp.concatenate([best_s, -nd], axis=1)
        cat_i = jnp.concatenate([best_i, gids], axis=1)
        ms, msel = jax.lax.top_k(-cat_s, k)
        return (-ms, jnp.take_along_axis(cat_i, msel, 1)), None

    init = (
        jnp.full((q.shape[0], k), jnp.inf),
        jnp.full((q.shape[0], k), -1, jnp.int32),
    )
    (s, i), _ = jax.lax.scan(body, init, (row_blocks, cell_blocks, bases))
    return s, i


@functools.partial(
    jax.jit,
    static_argnames=("k", "block", "metric", "has_cells", "has_codes",
                     "scan_topk", "recall_target"),
)
def masked_scan_search(
    q: jnp.ndarray,           # (Q, d) float32
    rows_or_codes: jnp.ndarray,  # (Mp, d) rows or (Mp, n_sub) uint8 codes
    codebooks,                # (n_sub, ksub, dsub) when has_codes
    cells,                    # (Mp,) int32 cell ids (when has_cells)
    member,                   # (Q, nlist) bool probe membership
    m_valid: jnp.ndarray,     # scalar: true row count
    k: int,
    block: int,
    metric: str = "l2",
    has_cells: bool = False,
    has_codes: bool = False,
    scan_topk: str = "exact",
    recall_target: float = 0.99,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One compiled scan over DB blocks: (decode ->) distance matmul ->
    IVF probe masking -> running top-k merge. The unified engine behind
    the index family (a Python block loop would pay one remote dispatch
    per op per block on this TPU transport).

    scan_topk: per-block candidate selection. 'exact' = lax.top_k
    (FAISS-parity ranking, the default). 'approx' = lax.approx_max_k
    (TPU partial-reduction top-k, Chern et al. 2022) at recall_target
    per neighbor. The block scan is TOP-K-BOUND, not matmul-bound, on
    v5e: exact lax.top_k over a (1024, 1M) score block costs ~75 ms
    while the distance matmul + masking cost ~8 ms and a bf16 matmul
    changes nothing (1.01x) - approx selection is 11.2x end-to-end
    (582 -> 52 ms per 1024-query chunk at 7M rows,
    scripts/profile_scan_dtype.py). The cross-block running merge stays
    exact either way, so misses are confined to within-block selection.
    """
    return _masked_scan_local(
        q, rows_or_codes, codebooks, cells, member, 0, m_valid, k, block,
        has_cells=has_cells, has_codes=has_codes, scan_topk=scan_topk,
        recall_target=recall_target,
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "block", "mesh", "has_cells", "has_codes",
                     "scan_topk", "recall_target"),
)
def masked_scan_search_sharded(
    q: jnp.ndarray,           # (Q, d) float32, replicated
    rows_or_codes: jnp.ndarray,  # (Mp, *) sharded over the 'db' axis
    codebooks,                # replicated (has_codes)
    cells,                    # (Mp,) int32, sharded over 'db'
    member,                   # (Q, nlist) bool, replicated
    m_valid: jnp.ndarray,     # scalar: true GLOBAL row count
    k: int,
    block: int,
    mesh: Mesh = None,
    has_cells: bool = False,
    has_codes: bool = False,
    scan_topk: str = "exact",
    recall_target: float = 0.99,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The masked block scan with the DB rows sharded over the mesh's
    'db' axis — the multi-chip path of the IVF/IVFPQ/LSH index family
    (the published eval index is 'ivfpq', reference eval.py:65-69).

    Each chip runs the same scan as masked_scan_search over its local
    shard (decode -> distance -> probe mask -> local top-k with GLOBAL
    row ids), then the (ndev*k) candidates are all-gathered over ICI and
    merged with one exact top-k — the exact_topk_sharded pattern. With
    scan_topk='exact' results equal the single-chip scan up to ties;
    'approx' applies lax.approx_max_k to the per-shard block selection
    only (the merge stays exact).

    Caller contract: rows/cells pre-padded to a multiple of
    (ndev * block) and device_put with a 'db' row sharding; padded tail
    rows are masked via m_valid."""
    ndev = mesh.shape[DB_AXIS]
    mp = rows_or_codes.shape[0]
    assert mp % (ndev * block) == 0, (mp, ndev, block)
    shard_rows = mp // ndev

    def local(qrep, rows_l, cb, cells_l, mem, mv):
        id_base = jax.lax.axis_index(DB_AXIS).astype(jnp.int32) * shard_rows
        s, i = _masked_scan_local(
            qrep, rows_l, cb, cells_l, mem, id_base, mv, k, block,
            has_cells=has_cells, has_codes=has_codes, scan_topk=scan_topk,
            recall_target=recall_target,
        )
        all_s = jax.lax.all_gather(s, DB_AXIS, axis=1, tiled=True)
        all_i = jax.lax.all_gather(i, DB_AXIS, axis=1, tiled=True)
        ms, sel = jax.lax.top_k(-all_s, k)
        return -ms, jnp.take_along_axis(all_i, sel, 1)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(DB_AXIS), P(), P(DB_AXIS), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(q, rows_or_codes, codebooks, cells, member, m_valid)


def exact_topk_streaming(
    q: np.ndarray,
    db,                      # np.memmap or ndarray, possibly >HBM
    k: int,
    host_block: int = 1 << 22,
    device_block: int = DB_BLOCK_ROWS,
    metric: str = "l2",
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact top-k over a larger-than-HBM database: stream host blocks
    (memmap reads) through the on-device scan and merge on host.

    For fingerprint workloads PQ compression usually makes the DB fit
    (31M x 64 B = 2 GB for fma_large) - use IndexIVFPQ then; this is the
    uncompressed-exact fallback. Each host block pays a host->device
    transfer, so size host_block to amortize (2 GB f32 blocks by
    default); device_block stays >= DB_BLOCK_ROWS to dodge the v5e
    small-f32-block pathology.
    """
    qj = jnp.asarray(np.asarray(q, np.float32))
    m = db.shape[0]
    best_s = np.full((len(q), k), np.inf if metric == "l2" else -np.inf,
                     np.float32)
    best_i = np.full((len(q), k), -1, np.int64)
    sign = -1.0 if metric == "l2" else 1.0
    for start in range(0, m, host_block):
        stop = min(start + host_block, m)
        blk = np.asarray(db[start:stop], np.float32)
        s, i = exact_topk(qj, jnp.asarray(blk), min(k, len(blk)),
                          metric=metric,
                          block_rows=min(device_block, len(blk)))
        s = np.asarray(s)
        i = np.asarray(i) + start
        cat_s = np.concatenate([best_s, s], axis=1)
        cat_i = np.concatenate([best_i, i], axis=1)
        order = np.argsort(sign * -cat_s, axis=1, kind="stable")[:, :k]
        best_s = np.take_along_axis(cat_s, order, 1)
        best_i = np.take_along_axis(cat_i, order, 1)
    return best_s, best_i


def exact_topk_sharded(
    q: jnp.ndarray,
    db: jnp.ndarray,
    k: int,
    mesh: Mesh,
    metric: str = "l2",
    m_valid: Optional[int] = None,
    scan_topk: str = "exact",
    recall_target: float = 0.99,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k with the DB sharded over the mesh 'db' axis.

    Local per-shard top-k -> ICI all-gather of (ndev*k) candidates ->
    merged global top-k. With scan_topk='exact' (the default) results
    are identical to exact_topk (up to ties); with scan_topk='approx'
    the LOCAL selection is approximate, so the exactness contract does
    NOT hold (per-neighbor recall ~recall_target instead).
    m_valid: true row count when the caller pre-padded db (padded rows
    are masked before selection).

    scan_topk='approx' applies lax.approx_max_k to the LOCAL per-shard
    selection (where the top-k-bound cost is, scaling with shard rows);
    the (ndev*k)-candidate ICI merge stays exact either way.
    """
    ndev = mesh.shape[DB_AXIS]
    m, d = db.shape
    if m_valid is None:
        m_valid = m
    shard = -(-m // ndev)
    pad = shard * ndev - m
    db_p = jnp.pad(db, ((0, pad), (0, 0)))
    kk = min(k, shard)

    def local(qrep, db_shard):
        sidx = jax.lax.axis_index(DB_AXIS)
        base = sidx * shard
        # pre-mask this shard's padded tail rows before the local top-k
        s, i = _topk_dist(qrep, db_shard, kk, metric=metric,
                          n_valid=m_valid - base, scan_topk=scan_topk,
                          recall_target=recall_target)
        gids = i + base
        all_s = jax.lax.all_gather(s, DB_AXIS, axis=1, tiled=True)   # (Q, ndev*kk)
        all_i = jax.lax.all_gather(gids, DB_AXIS, axis=1, tiled=True)
        if metric == "l2":
            ms, sel = jax.lax.top_k(-all_s, k)
            return -ms, jnp.take_along_axis(all_i, sel, 1)
        ms, sel = jax.lax.top_k(all_s, k)
        return ms, jnp.take_along_axis(all_i, sel, 1)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(DB_AXIS, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)(q, db_p)
