"""Retrieval latency vs block size / top-k algorithm (TPU).
NOTE (round 2): timings in this script predate scan_time_per_iter and
include the remote transport's fixed ~31 ms dispatch+fetch cost; treat
absolute numbers as upper bounds (relative comparisons at equal batch
and iteration counts remain valid). See utils/profiling.scan_time_per_iter.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from grafp_tpu.retrieval.search import exact_topk

def fence(x): return float(jnp.ravel(x)[0])

m, d = 7_000_000, 128
keys = jax.random.split(jax.random.key(1), 8)
db = jnp.concatenate([jax.random.normal(k, (m // 8, d), jnp.float32) for k in keys])
db = db / jnp.linalg.norm(db, axis=1, keepdims=True)
q = jax.random.normal(jax.random.key(3), (19, d), jnp.float32)

for br in (1 << 16, 1 << 18, 1 << 20, 1 << 22):
    f = jax.jit(lambda qq, dd, b=br: exact_topk(qq, dd, 20, block_rows=b)[1])
    fence(f(q, db))
    lat = []
    for t in range(10):
        t0 = time.time(); fence(f(q + t * 1e-5, db)); lat.append(time.time() - t0)
    print(f"block_rows={br:>8}: p50 {np.percentile(np.array(lat)*1e3,50):6.1f} ms", flush=True)

# approx_max_k over full scores
@jax.jit
def approx_full(qq, dd):
    inner = qq @ dd.T
    return jax.lax.approx_max_k(inner, 20)[1]
fence(approx_full(q, db))
lat = []
for t in range(10):
    t0 = time.time(); fence(approx_full(q + t * 1e-5, db)); lat.append(time.time() - t0)
print(f"approx_max_k (ip, full): p50 {np.percentile(np.array(lat)*1e3,50):6.1f} ms", flush=True)

# bf16 inner product variant
@jax.jit
def approx_bf16(qq, dd):
    inner = jnp.matmul(qq.astype(jnp.bfloat16), dd.T.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    return jax.lax.approx_max_k(inner, 20)[1]
fence(approx_bf16(q, db))
lat = []
for t in range(10):
    t0 = time.time(); fence(approx_bf16(q + t * 1e-5, db)); lat.append(time.time() - t0)
print(f"approx_max_k (bf16 ip):  p50 {np.percentile(np.array(lat)*1e3,50):6.1f} ms", flush=True)
