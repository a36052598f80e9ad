"""Sequence-level retrieval evaluation (the reference's eval_faiss,
eval.py:170-332), vectorized on device.

Protocol (identical to the reference):
  index = dummy_db ++ db; ground truth for query row i is
  i + len(dummy_db). For each test id and sequence length sl:
    1. top-k_probe segment search for each of the sl query rows;
    2. offset compensation: hit id at row o proposes sequence start
       (id - o) (eval.py:273-275);
    3. unique non-negative candidate starts (duplicates masked, not
       re-scored - ranking semantics preserved);
    4. sequence score = mean_i q_i . recon[cid+i] over the valid window
       (mean over the shorter window when cid+sl overruns the DB end,
       matching numpy's silent slice truncation in eval.py:281-287);
    5. rank top-10 -> top-1 exact / top-1 near (+-1 segment) / top-3 /
       top-10 hit rates (eval.py:289-311).

The per-test-id Python loop of the reference (2000 ids x 6 lengths x
FAISS search + numpy rescoring) becomes: ONE batched search over all
(test_id, row) segments, then a jitted, vmapped candidate-window scorer.

Artifacts match the reference byte-for-byte in naming and layout:
<result_dir>/hit_rates.npy (4, n_sl), raw_score.npy (n_test, 4*n_sl),
<emb_dir>/test_ids.npy.
"""

from __future__ import annotations

import functools
import os
import time
import uuid
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from grafp_tpu.retrieval.index import get_index
from grafp_tpu.retrieval.memmap_io import load_memmap_data

TID_BLOCK = 64  # test ids scored per jitted call

# Device-resident rescoring keeps the merged (dummy ++ db) fingerprints
# in HBM - fine at fma_medium (1.6 GB) but a 31M x 128 f32 fma_large DB
# is 16 GB, an OOM on a 16 GB v5e that also holds the search index. Past
# this budget the rescorer switches to host-side candidate-window gathers
# straight from the memmaps (the role of the reference's
# fake_recon_index, eval.py:218-237).
_DEF_RESCORE_BUDGET = 4 << 30  # bytes


def _rescore_hbm_budget() -> int:
    return int(os.environ.get("GRAFP_RESCORE_HBM_BUDGET",
                              _DEF_RESCORE_BUDGET))


class ConcatRows:
    """Virtual row-wise concat of two (memmap-backed) 2-d arrays; gathers
    rows without ever materializing the 16 GB merged DB in RAM."""

    def __init__(self, a, b):
        self.a, self.b = a, b
        self.shape = (a.shape[0] + b.shape[0], a.shape[1])
        self.nbytes = self.shape[0] * self.shape[1] * 4

    def gather(self, rows: np.ndarray) -> np.ndarray:
        out = np.empty((len(rows), self.shape[1]), np.float32)
        split = self.a.shape[0]
        lo = rows < split
        out[lo] = self.a[rows[lo]]
        out[~lo] = self.b[rows[~lo] - split]
        return out

    def materialize(self) -> np.ndarray:
        return np.concatenate([np.asarray(self.a), np.asarray(self.b)],
                              axis=0)


@functools.partial(jax.jit, static_argnames=("sl", "k10"))
def _score_block(
    recon: jnp.ndarray,       # (M, d) reconstructed index vectors
    q: jnp.ndarray,           # (B, sl, d) query sequences
    cand: jnp.ndarray,        # (B, C) candidate start ids (already unique-masked)
    valid: jnp.ndarray,       # (B, C) bool
    sl: int,
    k10: int = 10,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (top scores (B, k10), top candidate ids (B, k10))."""
    m = recon.shape[0]
    c = cand.shape[1]
    # windows: (B, C, sl) row ids, clamped; rows past the end contribute 0
    # and shrink the mean divisor (reference slice-truncation semantics).
    rows = cand[..., None] + jnp.arange(sl)[None, None, :]
    in_range = rows < m
    rows_c = jnp.clip(rows, 0, m - 1)
    win = recon[rows_c]                                   # (B, C, sl, d)
    sims = jnp.einsum("bcsd,bsd->bcs", win, q,
                      preferred_element_type=jnp.float32)
    sims = jnp.where(in_range, sims, 0.0)
    denom = jnp.maximum(jnp.sum(in_range, axis=-1), 1)
    scores = jnp.sum(sims, axis=-1) / denom               # (B, C)
    scores = jnp.where(valid, scores, -jnp.inf)
    kk = min(k10, c)
    top_s, sel = jax.lax.top_k(scores, kk)
    top_ids = jnp.take_along_axis(cand, sel, axis=1)
    top_ids = jnp.where(jnp.isfinite(top_s), top_ids, -999999)
    if kk < k10:
        top_s = jnp.pad(top_s, ((0, 0), (0, k10 - kk)),
                        constant_values=-jnp.inf)
        top_ids = jnp.pad(top_ids, ((0, 0), (0, k10 - kk)),
                          constant_values=-999999)
    return top_s, top_ids


def _score_block_host(
    recon,                    # ConcatRows or np.ndarray (memmap ok)
    q: np.ndarray,            # (B, sl, d)
    cand: np.ndarray,         # (B, C) candidate start ids
    valid: np.ndarray,        # (B, C) bool
    sl: int,
    k10: int = 10,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host twin of _score_block: identical semantics (window truncation,
    stable tie order, -999999 invalid fill), gathering candidate windows
    from the memmaps instead of HBM. FLOP count is trivial (~0.1 GFLOP
    per TID_BLOCK); the cost is the gather, which the OS page cache
    serves after the first pass."""
    m = recon.shape[0]
    b, c = cand.shape
    rows = cand[..., None] + np.arange(sl)[None, None, :]
    in_range = rows < m
    rows_c = np.clip(rows, 0, m - 1)
    flat = rows_c.reshape(-1)
    if hasattr(recon, "gather"):
        win = recon.gather(flat)
    else:
        win = np.asarray(recon[flat], np.float32)
    win = win.reshape(b, c, sl, -1)
    sims = np.einsum("bcsd,bsd->bcs", win, q, optimize=True)
    sims = np.where(in_range, sims, 0.0)
    denom = np.maximum(in_range.sum(axis=-1), 1)
    scores = sims.sum(axis=-1) / denom
    scores = np.where(valid, scores, -np.inf)
    kk = min(k10, c)
    # argsort(-scores, stable) == lax.top_k tie order (lower index first)
    sel = np.argsort(-scores, axis=1, kind="stable")[:, :kk]
    top_s = np.take_along_axis(scores, sel, 1).astype(np.float32)
    top_ids = np.take_along_axis(cand, sel, 1)
    top_ids = np.where(np.isfinite(top_s), top_ids, -999999)
    if kk < k10:
        top_s = np.pad(top_s, ((0, 0), (0, k10 - kk)),
                       constant_values=-np.inf)
        top_ids = np.pad(top_ids, ((0, 0), (0, k10 - kk)),
                         constant_values=-999999)
    return top_s, top_ids


def _unique_candidates(ids: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(B, C) int -> sorted ids with duplicate/negative entries masked."""
    s = np.sort(ids, axis=1)
    dup = np.zeros_like(s, dtype=bool)
    dup[:, 1:] = s[:, 1:] == s[:, :-1]
    valid = (s >= 0) & ~dup
    return s, valid


def evaluate_sequences(
    index,
    recon: np.ndarray,
    query: np.ndarray,
    test_ids: np.ndarray,
    gt_ids: np.ndarray,
    test_seq_len: Sequence[int],
    k_probe: int = 20,
    verbose: bool = True,
    rescore: str = "auto",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Core metric computation. Returns (top1_exact, top1_near,
    top3_exact, top10_exact) each (n_test, n_sl) ints.

    rescore: 'device' keeps the merged DB in HBM (fast path), 'host'
    gathers candidate windows from host memory/memmaps (the >HBM path,
    identical results), 'auto' picks by GRAFP_RESCORE_HBM_BUDGET.
    """
    n_test = len(test_ids)
    max_sl = int(max(test_seq_len))
    nbytes = getattr(recon, "nbytes",
                     recon.shape[0] * recon.shape[1] * 4)
    if rescore == "auto":
        rescore = "device" if nbytes <= _rescore_hbm_budget() else "host"
    if rescore == "device":
        recon_dev = jnp.asarray(
            recon.materialize() if isinstance(recon, ConcatRows) else recon
        )
    elif verbose:
        print(f"[eval] rescoring on host ({nbytes/2**30:.1f} GB merged DB "
              f"> HBM budget {_rescore_hbm_budget()/2**30:.1f} GB)")

    # one batched segment search for all rows of all test sequences
    rows = (test_ids[:, None] + np.arange(max_sl)[None, :]).reshape(-1)
    rows = np.minimum(rows, len(query) - 1)
    t0 = time.time()
    _, hits = index.search(query[rows], k_probe)          # (n_test*max_sl, k)
    hits = hits.reshape(n_test, max_sl, k_probe)
    if verbose:
        print(f"[eval] segment search: {time.time()-t0:.2f}s "
              f"({n_test * max_sl} rows, k={k_probe})")

    # offset compensation once at max length
    comp = hits - np.arange(max_sl)[None, :, None]
    comp = np.where(hits < 0, -1, comp)                   # missing stays invalid

    n_sl = len(test_seq_len)
    top1_exact = np.zeros((n_test, n_sl), int)
    top1_near = np.zeros((n_test, n_sl), int)
    top3_exact = np.zeros((n_test, n_sl), int)
    top10_exact = np.zeros((n_test, n_sl), int)

    for si, sl in enumerate(test_seq_len):
        sl = int(sl)
        cand_all = comp[:, :sl, :].reshape(n_test, sl * k_probe)
        cand_s, valid = _unique_candidates(cand_all)
        t0 = time.time()
        for b0 in range(0, n_test, TID_BLOCK):
            b1 = min(b0 + TID_BLOCK, n_test)
            qs = np.stack([
                query[t:t + sl] for t in test_ids[b0:b1]
            ])                                            # (B, sl, d)
            if rescore == "device":
                _, top_ids = _score_block(
                    recon_dev,
                    jnp.asarray(qs),
                    jnp.asarray(cand_s[b0:b1]),
                    jnp.asarray(valid[b0:b1]),
                    sl,
                )
            else:
                _, top_ids = _score_block_host(
                    recon, np.asarray(qs, np.float32),
                    cand_s[b0:b1], valid[b0:b1], sl,
                )
            pred = np.asarray(top_ids)                    # (B, 10)
            gt = gt_ids[b0:b1][:, None]
            top1_exact[b0:b1, si] = (pred[:, :1] == gt).ravel().astype(int)
            top1_near[b0:b1, si] = (np.abs(pred[:, 0] - gt_ids[b0:b1]) <= 1).astype(int)
            top3_exact[b0:b1, si] = (pred[:, :3] == gt).any(axis=1).astype(int)
            top10_exact[b0:b1, si] = (pred[:, :10] == gt).any(axis=1).astype(int)
        if verbose:
            print(f"[eval] seq_len {sl}: rescoring {time.time()-t0:.2f}s")

    return top1_exact, top1_near, top3_exact, top10_exact


def resolve_test_ids(test_ids, n_query: int, max_sl: int) -> np.ndarray:
    """Reference semantics (eval.py:240-247): 'all' -> every viable start;
    numeric string -> seeded permutation subset; else -> .npy path.

    File-provided / array-provided ids are clamped into
    [0, n_query - max_sl] so a test id within max_sl of the query end
    cannot produce a short window (the batched rescorer stacks
    query[t:t+sl] rows; the reference's per-id numpy slices silently
    truncate instead, eval.py:281-287 - the 'all'/numeric branches
    already generate only viable starts, so only external ids need the
    guard)."""
    def _clamp(ids: np.ndarray) -> np.ndarray:
        return np.clip(ids, 0, max(n_query - max_sl, 0))

    if isinstance(test_ids, np.ndarray):
        return _clamp(test_ids.astype(int))
    if str(test_ids).lower() == "all":
        return np.arange(0, n_query - max_sl, 1)
    if str(test_ids).isnumeric():
        np.random.seed(42)
        return np.random.permutation(n_query - max_sl)[: int(test_ids)]
    return _clamp(np.load(test_ids).astype(int))


def eval_faiss(
    emb_dir: str,
    emb_dummy_dir: Optional[str] = None,
    index_type: str = "ivfpq",
    nogpu: bool = False,
    max_train: float = 1e7,
    test_ids="icassp",
    test_seq_len="1 3 5 9 11 19",
    k_probe: int = 20,
    n_centroids: int = 64,
    verbose: bool = True,
    mesh=None,
    scan_topk: str = "exact",
    scan_recall: float = 0.99,
    rescore: str = "auto",
) -> np.ndarray:
    """Drop-in equivalent of reference eval.py:170-332 (the name is kept
    for CLI parity; the engine is the on-TPU index family, not FAISS).

    mesh: optional jax.sharding.Mesh with a 'db' axis - threads through
    to get_index so the 'l2' mode shards the database rows across chips
    (per-chip distance matmul + local top-k, ICI all-gather merge). This
    is the multi-chip path of the reference's eval contract
    (eval.py:206-216); identical results to the single-chip index.

    scan_topk/scan_recall: per-block candidate selection inside the
    index scan - 'exact' (default, FAISS-parity ranking) or 'approx'
    (lax.approx_max_k; the scan is top-k-bound on v5e, approx is ~11x
    faster at ~0.99 per-neighbor recall - see
    retrieval/search.py:masked_scan_search).

    rescore: sequence-rescoring placement - 'device' (merged DB in HBM),
    'host' (memmap window gathers, the >HBM path, identical results), or
    'auto' (default: pick by GRAFP_RESCORE_HBM_BUDGET; see
    evaluate_sequences)."""
    if rescore not in ("auto", "device", "host"):
        raise ValueError(
            f"rescore must be 'auto', 'device' or 'host', got {rescore!r}")
    if isinstance(test_seq_len, str):
        test_seq_len = np.asarray(list(map(int, test_seq_len.split())))
    else:
        test_seq_len = np.asarray(test_seq_len)

    query, query_shape = load_memmap_data(emb_dir, "query", display=verbose)
    db, db_shape = load_memmap_data(emb_dir, "db", display=verbose)
    if emb_dummy_dir is None:
        emb_dummy_dir = emb_dir
    dummy_db, dummy_db_shape = load_memmap_data(
        emb_dummy_dir, "dummy_db", display=verbose
    )

    index = get_index(index_type, dummy_db, dummy_db.shape, (not nogpu),
                      max_train, n_centroids=n_centroids, mesh=mesh,
                      scan_topk=scan_topk, scan_recall=scan_recall)
    t0 = time.time()
    index.add(dummy_db)
    index.add(db)
    if verbose:
        print(f"Added total {index.ntotal} items to DB. "
              f"{time.time()-t0:>4.2f} sec.")

    # Rescoring vectors: the reference reconstructs from a merged memmap
    # (eval.py:218-237). NOTE the reference rescores with the ORIGINAL db
    # vectors (its fake_recon_index holds raw fingerprints, not PQ
    # codes); we do the same. The virtual concat never materializes the
    # merged DB - evaluate_sequences moves it to HBM only when it fits
    # (fma_medium), and window-gathers from the memmaps when it does not
    # (fma_large, 16 GB).
    recon = ConcatRows(dummy_db, db)

    tids = resolve_test_ids(test_ids, len(query), int(max(test_seq_len)))
    gt_ids = tids + int(dummy_db_shape[0])
    if verbose:
        print(f"test_id: {test_ids},  n_test: {len(tids)}")

    t1e, t1n, t3e, t10e = evaluate_sequences(
        index, recon, np.asarray(query), tids, gt_ids, test_seq_len,
        k_probe=k_probe, verbose=verbose, rescore=rescore,
    )

    hit_rates = np.stack([
        100.0 * t1e.mean(axis=0),
        100.0 * t1n.mean(axis=0),
        100.0 * t3e.mean(axis=0),
        100.0 * t10e.mean(axis=0),
    ])

    result_dir = os.path.join(emb_dir, str(uuid.uuid4().hex)[:8])
    os.makedirs(result_dir, exist_ok=True)
    np.save(f"{result_dir}/hit_rates.npy", hit_rates)
    np.save(f"{result_dir}/raw_score.npy",
            np.concatenate((t1e, t1n, t3e, t10e), axis=1))
    np.save(f"{emb_dir}/test_ids.npy", tids)
    if verbose:
        print(f"Saved test_ids, hit-rates and raw score to {result_dir}.")
    return hit_rates
