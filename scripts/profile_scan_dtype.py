"""Exact-scan block profile: f32 vs bf16 distance matmul, top_k vs
approx_max_k (TPU v5e).

The index family's unified scan (retrieval/search.py masked_scan_search
and exact_topk) scores blocks with an f32 matmul. On v5e the MXU's f32
path is ~4x slower than bf16-with-f32-accumulation, and the repo has
already established bf16 fingerprints are ranking-safe (BASELINE.md:
cosine min 0.998; IVFPQ runs a decoded-bf16 cache at recall@1 0.996).
This probe measures what the scan would gain from (a) scoring in bf16
and (b) replacing the per-block exact lax.top_k with approx_max_k.

Timing: single runs, inputs varied per rep (remote dedup), fenced by a
value fetch of a checksum over BOTH outputs (DCE); the fixed ~31 ms
dispatch cost is <5% at these ~1 s scales.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np

Q, M, D, K, BLOCK = 1024, 7_000_000, 128, 20, 1 << 20

keys = jax.random.split(jax.random.key(1), 8)
db = jnp.concatenate([jax.random.normal(k, (M // 8, D), jnp.float32) for k in keys])
db = db / jnp.linalg.norm(db, axis=1, keepdims=True)
db_bf = db.astype(jnp.bfloat16)
q0 = jax.random.normal(jax.random.key(3), (Q, D), jnp.float32)
q0 = q0 / jnp.linalg.norm(q0, axis=1, keepdims=True)

NBLK = -(-M // BLOCK)
PAD = NBLK * BLOCK - M


def scan_search(qq, rows, score_dtype, topk_kind):
    """One scan over 1M-row blocks: matmul in score_dtype (f32 accum),
    l2 ranking via -2*inner + ||db||^2 (||q||^2 is rank-constant), then
    per-block selection + running merge."""
    mp = jnp.pad(rows, ((0, PAD), (0, 0)))
    blocks = mp.reshape(NBLK, BLOCK, -1)
    bases = jnp.arange(NBLK) * BLOCK
    qd = qq.astype(score_dtype)

    def body(carry, inp):
        best_s, best_i = carry
        blk, base = inp
        inner = jnp.matmul(qd, blk.T.astype(score_dtype),
                           preferred_element_type=jnp.float32)
        dbsq = jnp.sum(jnp.square(blk.astype(jnp.float32)), axis=1)
        dist = dbsq[None, :] - 2.0 * inner
        ids = base + jnp.arange(BLOCK)
        dist = jnp.where((ids >= M)[None, :], jnp.inf, dist)
        if topk_kind == "exact":
            nd, sel = jax.lax.top_k(-dist, K)
        else:
            nd, sel = jax.lax.approx_max_k(-dist, K, recall_target=0.99)
        cat_s = jnp.concatenate([best_s, -nd], axis=1)
        cat_i = jnp.concatenate([best_i, ids[sel]], axis=1)
        ns, msel = jax.lax.top_k(-cat_s, K)
        return (-ns, jnp.take_along_axis(cat_i, msel, 1)), None

    init = (jnp.full((Q, K), jnp.inf), jnp.zeros((Q, K), jnp.int32))
    (s, i), _ = jax.lax.scan(body, init, (blocks, bases))
    return jnp.sum(s) + jnp.sum(i.astype(jnp.float32))


def run(label, rows, score_dtype, topk_kind, reps=4):
    # rows passed as an ARG, not closed over: closure capture bakes the
    # 3.6 GB DB into the program as a constant (brutal compile).
    f = jax.jit(lambda qq, rr: scan_search(qq, rr, score_dtype, topk_kind))
    t0 = time.time(); float(f(q0, rows)); print(f"{label}: compile+first {time.time()-t0:.1f}s", flush=True)
    lat = []
    for t in range(reps):
        qv = q0 + (t + 1) * 1e-5
        t0 = time.time(); float(f(qv, rows)); lat.append(time.time() - t0)
    p50 = float(np.percentile(np.array(lat) * 1e3, 50))
    print(f"{label}: p50 {p50:7.1f} ms  ({Q/(p50/1e3):,.0f} q/s)", flush=True)
    return p50


def library_engine():
    """Same comparison through the REAL engine (masked_scan_search with
    scan_topk exact vs approx): timing + per-neighbor recall@20 and
    top-1 agreement of the approx path against exact ground truth."""
    from grafp_tpu.retrieval.search import masked_scan_search

    mp = jnp.pad(db, ((0, PAD), (0, 0)))
    member = jnp.zeros((Q, 1), bool)
    cells = jnp.zeros((mp.shape[0],), jnp.int32)
    cbs = jnp.zeros((1, 1, 1), jnp.float32)

    def run_mode(mode, reps=4):
        lat, outs = [], None
        for t in range(reps + 1):
            qv = q0 + t * 1e-5
            t0 = time.time()
            s, i = masked_scan_search(qv, mp, cbs, cells, member,
                                      jnp.int32(M), K, BLOCK,
                                      scan_topk=mode)
            ids = np.asarray(i)            # fetch = fence
            dt = time.time() - t0
            if t == 0:
                print(f"engine {mode}: compile+first {dt:.1f}s", flush=True)
                outs = ids
            else:
                lat.append(dt)
        p50 = float(np.percentile(np.array(lat) * 1e3, 50))
        print(f"engine {mode}: p50 {p50:7.1f} ms  ({Q/(p50/1e3):,.0f} q/s)",
              flush=True)
        return p50, outs

    pe, ids_e = run_mode("exact")
    pa, ids_a = run_mode("approx")
    rec = float(np.mean([len(np.intersect1d(a, b)) / K
                         for a, b in zip(ids_a, ids_e)]))
    top1 = float(np.mean(ids_a[:, 0] == ids_e[:, 0]))
    print(f"engine approx vs exact: {pe/pa:.2f}x, recall@{K} {rec:.4f}, "
          f"top-1 agreement {top1:.4f}", flush=True)


if __name__ == "__main__":
    base = run("f32 matmul + exact top_k  (current)", db, jnp.float32, "exact")
    b1 = run("bf16 matmul + exact top_k          ", db_bf, jnp.bfloat16, "exact")
    b2 = run("bf16 matmul + approx_max_k(0.99)   ", db_bf, jnp.bfloat16, "approx")
    print(f"speedups vs current: bf16 {base/b1:.2f}x, bf16+approx {base/b2:.2f}x")
    library_engine()
