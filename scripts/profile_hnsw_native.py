"""Measure the first-party C++ HNSW at protocol scale (VERDICT r4 #5).

The reference's 'hnsw' mode is CPU FAISS IndexHNSWFlat(M=16, efC=80)
(/root/reference/eval.py:90-98), which handles fma_medium/fma_large row
counts by parallelizing inserts across cores. Our backend
(native/src/hnsw_native.cpp) is sequential on this 1-core host; round 4
set NATIVE_MAX_ROWS = 2M from an UNMEASURED "minutes-to-an-hour"
estimate. This script replaces the estimate with numbers:

  build   wall-clock per 100k-row chunk (insertion cost grows ~log N)
  search  p50 / p95 single-query latency at k=20, ef_search=64
  recall  recall@1 and recall@20 vs exact ground truth (blocked numpy)

Usage:
  python scripts/profile_hnsw_native.py [--rows 1000000] [--queries 500]
      [--d 128] [--chunk 100000] [--ef_sweep]

--ef_sweep additionally reports recall@1/recall@20 and batched q/s at
ef_search in {32,64,128,256,512} (the BASELINE.md 100k-row curve is
`--rows 100000 --ef_sweep`). Writes one summary block to stdout for
BASELINE.md.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def unit_rows(rng, n, d):
    x = rng.randn(n, d).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True) + 1e-12
    return x


def exact_gt(db, q, k, block=200_000):
    """Exact L2 top-k by blocked matmul (unit rows: argmin d2 ==
    argmax dot, but compute true L2 for generality)."""
    nq = len(q)
    best_d = np.full((nq, k), np.inf, np.float32)
    best_i = np.full((nq, k), -1, np.int64)
    q2 = (q ** 2).sum(1, keepdims=True)
    for s in range(0, len(db), block):
        blk = db[s:s + block]
        d2 = q2 - 2.0 * q @ blk.T + (blk ** 2).sum(1)[None, :]
        cat_d = np.concatenate([best_d, d2], axis=1)
        cat_i = np.concatenate(
            [best_i, np.broadcast_to(np.arange(s, s + len(blk)),
                                     (nq, len(blk)))], axis=1)
        sel = np.argsort(cat_d, axis=1, kind="stable")[:, :k]
        best_d = np.take_along_axis(cat_d, sel, 1)
        best_i = np.take_along_axis(cat_i, sel, 1)
    return best_d, best_i


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--queries", type=int, default=500)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=100_000)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--ef_sweep", action="store_true")
    args = ap.parse_args()

    from grafp_tpu.native.hnsw_native import HNSWNative, available

    assert available(), "C++ HNSW backend not buildable on this host"
    rng = np.random.RandomState(0)
    print(f"[gen] {args.rows:,} x {args.d} unit rows", flush=True)
    db = unit_rows(rng, args.rows, args.d)

    idx = HNSWNative(args.d, m=16, ef_construction=80, seed=0)
    t0 = time.time()
    for s in range(0, args.rows, args.chunk):
        tc = time.time()
        idx.add(db[s:s + args.chunk])
        el = time.time() - t0
        print(f"[build] {idx.ntotal:>9,} rows  chunk "
              f"{(time.time()-tc):6.1f}s  total {el:7.1f}s  "
              f"({idx.ntotal/el:,.0f} rows/s avg)", flush=True)
    build_s = time.time() - t0

    # queries: noisy copies of random db rows
    gt_rows = rng.choice(args.rows, size=args.queries, replace=False)
    q = db[gt_rows] + 0.05 * rng.randn(args.queries, args.d).astype(
        np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    print("[gt] exact ground truth (blocked numpy)...", flush=True)
    t0 = time.time()
    _, gt_i = exact_gt(db, q, args.k)
    print(f"[gt] {time.time()-t0:.1f}s", flush=True)

    # batched search throughput
    t0 = time.time()
    _, ids = idx.search(np.ascontiguousarray(q), args.k, ef_search=64)
    batch_s = time.time() - t0

    # single-query latency distribution
    lat = []
    for r in range(min(args.queries, 200)):
        t0 = time.time()
        idx.search(np.ascontiguousarray(q[r:r + 1]), args.k, ef_search=64)
        lat.append(time.time() - t0)
    lat = np.sort(np.asarray(lat))

    r1 = float((ids[:, 0] == gt_i[:, 0]).mean())
    inter = np.asarray([
        len(set(ids[r].tolist()) & set(gt_i[r].tolist())) / args.k
        for r in range(args.queries)
    ])
    print("\n===== C++ HNSW @ {:,} rows x {} (M=16, efC=80, efS=64) ====="
          .format(args.rows, args.d))
    print(f"build: {build_s:,.1f} s total "
          f"({args.rows/build_s:,.0f} rows/s avg)")
    print(f"search: batch {args.queries} queries in {batch_s:.2f}s "
          f"({args.queries/batch_s:,.0f} q/s); single-query "
          f"p50 {lat[len(lat)//2]*1e3:.2f} ms / "
          f"p95 {lat[int(len(lat)*0.95)]*1e3:.2f} ms")
    print(f"recall@1 {r1:.4f}   mean recall@{args.k} {inter.mean():.4f}")

    if args.ef_sweep:
        print(f"\n[ef_sweep] recall vs ef_search at {args.rows:,} rows")
        for efs in (32, 64, 128, 256, 512):
            t0 = time.time()
            _, ids = idx.search(np.ascontiguousarray(q), args.k,
                                ef_search=efs)
            dt = time.time() - t0
            r1 = float((ids[:, 0] == gt_i[:, 0]).mean())
            r20 = np.mean([
                len(set(ids[r].tolist()) & set(gt_i[r].tolist())) / args.k
                for r in range(args.queries)
            ])
            print(f"  efS={efs:4d}  recall@1 {r1:.4f}  "
                  f"recall@{args.k} {r20:.4f}  "
                  f"batch {args.queries} in {dt:.2f}s "
                  f"({args.queries/dt:,.0f} q/s)", flush=True)


if __name__ == "__main__":
    main()
