"""fma_large-scale eval smoke on ONE v5e (VERDICT r1 missing #4 proof).

Synthesizes the fma_large geometry as memmaps - 30.6M dummy rows +
500k aligned db/query rows (query = db + noise), 31.1M x 128 f32 total
(15.9 GB merged, deliberately bigger than the 16 GB HBM) - and runs the
full eval_faiss protocol with the ivfpq index. The merged rescoring DB
exceeds GRAFP_RESCORE_HBM_BUDGET, so the host window-gather tier (the
reference's fake_recon_index role) is exercised at true scale; round
1's monolithic jnp.asarray(concat) OOM'd exactly here.

Run on the real TPU: python scripts/fma_large_smoke.py [--dummy 30600000]
Writes memmaps under /tmp/fma_large_smoke (~16 GB disk).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

D = 128


def write_memmap(path, fname, n, seed, base=None, noise=0.0):
    """Chunked normalized random rows; base+noise for corrupted copies."""
    mm = np.memmap(os.path.join(path, fname + ".mm"), np.float32,
                   mode="w+", shape=(n, D))
    rng = np.random.RandomState(seed)
    chunk = 1 << 20
    for s in range(0, n, chunk):
        e = min(n, s + chunk)
        if base is None:
            x = rng.randn(e - s, D).astype(np.float32)
        else:
            x = base[s:e] + noise * rng.randn(e - s, D).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True) + 1e-9
        mm[s:e] = x
    mm.flush()
    np.save(os.path.join(path, fname + "_shape.npy"), np.array([n, D]))
    return mm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dummy", type=int, default=30_600_000)
    ap.add_argument("--nq", type=int, default=500_000)
    ap.add_argument("--root", default="/tmp/fma_large_smoke")
    args = ap.parse_args()

    from grafp_tpu.retrieval.evaluate import eval_faiss

    os.makedirs(args.root, exist_ok=True)
    t0 = time.time()
    if not os.path.exists(os.path.join(args.root, "dummy_db.mm")):
        write_memmap(args.root, "dummy_db", args.dummy, seed=0)
        db = write_memmap(args.root, "db", args.nq, seed=1)
        # queries = corrupted copies of the db rows (segment-aligned)
        write_memmap(args.root, "query", args.nq, seed=2, base=db,
                     noise=0.25)
        print(f"[data] {args.dummy + args.nq:,} x {D} memmaps "
              f"({(args.dummy + args.nq) * D * 4 / 1e9:.1f} GB) "
              f"in {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    hr = eval_faiss(
        args.root, index_type="ivfpq", nogpu=True, max_train=1_000_000,
        test_ids="500", test_seq_len="1 11 19", k_probe=20,
        n_centroids=64, verbose=True,
    )
    print(f"[eval] total {time.time()-t0:.0f}s", flush=True)
    print(f"[eval] top1-exact {np.round(hr[0], 1)}  "
          f"top1-near {np.round(hr[1], 1)}  top3 {np.round(hr[2], 1)}",
          flush=True)


if __name__ == "__main__":
    main()
