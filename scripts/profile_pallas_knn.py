"""Pallas fused knn-maxrel vs XLA onehot at each stage shape (TPU).
NOTE (round 2): timings in this script predate scan_time_per_iter and
include the remote transport's fixed ~31 ms dispatch+fetch cost; treat
absolute numbers as upper bounds (relative comparisons at equal batch
and iteration counts remain valid). See utils/profiling.scan_time_per_iter.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from grafp_tpu.ops.mrconv_neighbors import max_neighbors_onehot
from grafp_tpu.ops.pallas_knn import max_neighbors_pallas

REPS, K, B = 10, 3, 256

def timed(name, fn, x):
    @jax.jit
    def run(x, s0):
        def step(c, i):
            return jnp.sum(fn(x + c * 1e-20)).astype(jnp.float32) * 1e-20 + c, None
        s, _ = jax.lax.scan(step, s0, jnp.arange(REPS))
        return s
    t0 = time.time(); float(run(x, jnp.float32(0))); c = time.time() - t0
    t0 = time.time(); float(run(x, jnp.float32(1e-9)))
    print(f"{name:32s} {(time.time()-t0)/REPS*1e3:8.2f} ms  (compile {c:.0f}s)", flush=True)

rng = np.random.RandomState(0)
print("backend", jax.default_backend(), flush=True)
for (n, c) in ((1024, 64), (512, 128), (256, 256), (128, 512)):
    x = jnp.asarray(rng.randn(B, n, c).astype(np.float32))
    # correctness on-device first
    p = np.asarray(max_neighbors_pallas(x[:2], K, False))
    o = np.asarray(max_neighbors_onehot(x[:2], K))
    print(f"N={n} C={c} maxdiff pallas-vs-onehot: {np.abs(p-o).max():.2e}", flush=True)
    timed(f"onehot N={n} C={c}", lambda xx: max_neighbors_onehot(xx, K), x)
    timed(f"pallas N={n} C={c}", lambda xx: max_neighbors_pallas(xx, K, False), x)
