"""Extended TPU benchmark suite (beyond bench.py's headline number):

  1. train step (B=256, fused augment+logmel+fwd+bwd+adam) - steps/s
  2. retrieval at fma_medium scale (7M x 128 DB on-chip):
     - batched segment search throughput (the eval workload)
     - single-sequence query latency p50 (the serving workload)
  3. fingerprint DB build throughput via the streaming builder path

Run: python scripts/bench_suite.py   (on the TPU; ~10 min incl compiles)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def fence(x):
    return float(jnp.ravel(x)[0])


def bench_train_step():
    from grafp_tpu.core.config import Config
    from grafp_tpu.dsp.augment import AugmentBanks
    from grafp_tpu.models import build_model
    from grafp_tpu.train import create_train_state, make_train_step

    cfg = Config(compute_dtype="bfloat16")
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.key(0), 32)
    rng = np.random.RandomState(0)
    banks = AugmentBanks.from_arrays(
        noise_clips=[rng.randn(64000).astype(np.float32) for _ in range(8)],
        ir_clips=[np.r_[1.0, rng.randn(8000) * 0.05].astype(np.float32)
                  for _ in range(4)],
        noise_len=64000, ir_len=8192,
    )
    step = make_train_step(model, cfg, banks, donate=False)
    x_i = jnp.asarray(rng.randn(256, 16000).astype(np.float32))
    x_j = jnp.asarray(rng.randn(256, 16000).astype(np.float32))

    t0 = time.time()
    state, m = step(state, x_i, x_j, jax.random.key(0))
    fence(m["loss"])
    print(f"[train] compile+first step: {time.time()-t0:.0f}s", flush=True)
    iters = 5
    t0 = time.time()
    for i in range(iters):
        state, m = step(state, x_i, x_j, jax.random.key(i + 1))
    fence(m["loss"])
    dt = (time.time() - t0) / iters
    print(f"[train] step: {dt*1e3:.1f} ms  ({256/dt:,.0f} pairs/s, "
          f"loss {float(m['loss']):.3f})", flush=True)


def bench_retrieval():
    from grafp_tpu.retrieval.search import exact_topk

    rng = np.random.RandomState(0)
    m, d = 7_000_000, 128
    print(f"[retr] building {m:,} x {d} DB on device "
          f"({m*d*4/1e9:.1f} GB f32)...", flush=True)
    # generate on device in chunks to avoid host RAM spikes
    keys = jax.random.split(jax.random.key(1), 8)
    parts = [jax.random.normal(k, (m // 8, d), jnp.float32) for k in keys]
    db = jnp.concatenate(parts)
    db = db / jnp.linalg.norm(db, axis=1, keepdims=True)
    del parts

    # eval-style batched segment search: 2048 segments x top-20
    q = jax.random.normal(jax.random.key(2), (2048, d), jnp.float32)
    t0 = time.time()
    s, i = exact_topk(q, db, 20, block_rows=1 << 20)
    fence(i)
    print(f"[retr] compile: {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    s, i = exact_topk(q * 1.0001, db, 20, block_rows=1 << 20)
    fence(i)
    dt = time.time() - t0
    print(f"[retr] batched search 2048 q x 7M: {dt*1e3:.0f} ms "
          f"({2048/dt:,.0f} segment-queries/s)", flush=True)

    # serving latency: one 19-segment sequence
    q1 = jax.random.normal(jax.random.key(3), (19, d), jnp.float32)
    lat = []
    s, i = exact_topk(q1, db, 20, block_rows=1 << 20)
    fence(i)
    for t in range(20):
        t0 = time.time()
        s, i = exact_topk(q1 + t * 1e-5, db, 20, block_rows=1 << 20)
        fence(i)
        lat.append(time.time() - t0)
    lat = np.asarray(lat) * 1e3
    print(f"[retr] single-sequence (19 seg) latency p50 {np.percentile(lat,50):.1f} ms "
          f"p90 {np.percentile(lat,90):.1f} ms", flush=True)


def bench_db_build():
    from grafp_tpu.core.config import Config
    from grafp_tpu.fp.builder import FingerprintPipeline
    from grafp_tpu.models import build_model
    from grafp_tpu.retrieval.memmap_io import MemmapWriter

    cfg = Config(compute_dtype="bfloat16")
    model = build_model(cfg)
    v = model.init({"params": jax.random.key(0)}, jnp.zeros((1, 64, 32)), False)
    pipe = FingerprintPipeline(model, cfg, v["params"], v["batch_stats"],
                               batch_size=256, bucket_s=10.0)
    rng = np.random.RandomState(0)
    tracks = [rng.randn(16000 * 30).astype(np.float32) * 0.2 for _ in range(8)]
    import tempfile

    tmp = tempfile.mkdtemp()
    w = MemmapWriter(tmp, "dummy_db", 128, capacity=50000)
    # warm
    t0 = time.time()
    n = pipe.embed_stream((pipe.segments_for(t) for t in tracks[:2]), w)
    print(f"[build] compile+2 tracks: {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    n = pipe.embed_stream((pipe.segments_for(t) for t in tracks[2:]), w)
    dt = time.time() - t0
    w.close()
    print(f"[build] {n} fingerprints from 6x30s tracks in {dt:.2f}s "
          f"({n/dt:,.0f} fp/s incl host segmentation)", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    bench_train_step()
    bench_retrieval()
    bench_db_build()
