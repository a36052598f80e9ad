"""Time the neighbor-selection strategies on TPU at per-stage shapes.
NOTE (round 2): timings in this script predate scan_time_per_iter and
include the remote transport's fixed ~31 ms dispatch+fetch cost; treat
absolute numbers as upper bounds (relative comparisons at equal batch
and iteration counts remain valid). See utils/profiling.scan_time_per_iter.
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import jax
import jax.numpy as jnp
import numpy as np

from grafp_tpu.ops.mrconv_neighbors import (
    max_neighbors_approx,
    max_neighbors_exact,
    max_neighbors_onehot,
)

REPS = 10
K = 3


def timed(name, fn, x):
    @jax.jit
    def run(x, s0):
        def step(c, i):
            out = fn(x + c * 1e-20, K)
            return jnp.sum(out).astype(jnp.float32) * 1e-20 + c, None

        s, _ = jax.lax.scan(step, s0, jnp.arange(REPS))
        return s

    t0 = time.time()
    float(run(x, jnp.float32(0)))
    c = time.time() - t0
    t0 = time.time()
    float(run(x, jnp.float32(1e-9)))
    t = (time.time() - t0) / REPS * 1e3
    print(f"{name:36s} {t:8.2f} ms/iter  (compile {c:.0f}s)", flush=True)


def main():
    rng = np.random.RandomState(0)
    print(f"backend={jax.default_backend()} k={K} reps={REPS}", flush=True)
    for (b, n, c) in ((256, 1024, 64), (256, 512, 128), (256, 256, 256), (256, 128, 512)):
        x = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
        print(f"-- B={b} N={n} C={c}")
        for name, fn in (("exact", max_neighbors_exact),
                         ("approx", max_neighbors_approx),
                         ("onehot", max_neighbors_onehot)):
            for dt in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
                timed(f"{name} {dt[1]}",
                      lambda xx, kk, f=fn, d=dt[0]: f(xx, kk, compute_dtype=d), x)


if __name__ == "__main__":
    main()
