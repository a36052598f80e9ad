"""IVFPQ scan_topk exact-vs-approx at 7M rows (TPU v5e).

The flat-engine measurement (scripts/profile_scan_dtype.py: 10.05x,
recall@20 0.9993) isolates the selection change; this script measures
the same knob on the DEFAULT eval path (index_type 'ivfpq',
reference eval.py:9-123 contract: nlist=64, code_sz=64, nprobe=20) -
PQ decode + probe mask + selection composed in the real index.
Recall here is approx-vs-exact ON THE SAME INDEX (same probes, same
codes), isolating the selection swap from PQ quantization.

STATUS (round 3, not yet landed): ran out of round budget before the
first search compiled. Measured so far on this host at M=3.5M: host
row generation ~6 min (page-fault-bound - this VM faults fresh pages
at ~10 MB/s; budget for it), kmeans train 40 s, add/encode 197 s
(host->device transfer dominated). Budget >=25 min total; the IVFPQ
scan program's first compile is the long pole after add. The flat
engine number (profile_scan_dtype.py: 10.05x) bounds the expected
gain; selection is the same code path (search.py masked_scan_search).
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
from grafp_tpu.retrieval.index import get_index

M, D, K, NQ = 3_500_000, 128, 20, 1024

# Generator.standard_normal(dtype=f32): legacy RandomState.randn is
# float64 Box-Muller and takes >10 min for these shapes on the 1-core host
rng = np.random.default_rng(11)
print("generating host rows...", flush=True)
rows = rng.standard_normal((M, D), dtype=np.float32)
rows /= np.linalg.norm(rows, axis=1, keepdims=True)
q = rows[rng.choice(M, NQ, replace=False)] + \
    0.05 * rng.standard_normal((NQ, D), dtype=np.float32)
q /= np.linalg.norm(q, axis=1, keepdims=True)

t0 = time.time()
idx = get_index("ivfpq", rows, rows.shape, use_gpu=False, max_nitem_train=5e5)
print(f"train {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
idx.add(rows)
print(f"add/encode {time.time()-t0:.1f}s", flush=True)


def timed(mode, reps=3):
    idx.scan_topk = mode
    lat, ids0 = [], None
    for t in range(reps + 1):
        qv = q + t * 1e-5          # vary inputs (remote dedup)
        t0 = time.time()
        _, ids = idx.search(qv, K)  # np fetch = fence
        dt = time.time() - t0
        if t == 0:
            print(f"{mode}: compile+first {dt:.1f}s", flush=True)
            ids0 = ids
        else:
            lat.append(dt)
    p50 = float(np.percentile(np.array(lat) * 1e3, 50))
    print(f"{mode}: p50 {p50:7.1f} ms  ({NQ/(p50/1e3):,.0f} q/s)", flush=True)
    return p50, ids0


pe, ids_e = timed("exact")
pa, ids_a = timed("approx")
rec = float(np.mean([len(np.intersect1d(a, b)) / K
                     for a, b in zip(ids_a, ids_e)]))
top1 = float(np.mean(ids_a[:, 0] == ids_e[:, 0]))
print(f"ivfpq approx vs exact: {pe/pa:.2f}x, recall@{K} {rec:.4f}, "
      f"top-1 agreement {top1:.4f}", flush=True)
