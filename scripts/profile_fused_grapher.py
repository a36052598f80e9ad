"""Fused whole-Grapher kernel vs the XLA+frontend-kernel path, per
stage shape, on the real chip.

The first fused-everywhere bench REGRESSED (13,908 vs 14,389 fp/s), so
fusion must be gated per shape. This times ONE eval Grapher block at
each stage's (N, C) with B=128 bf16, fused vs unfused, using the
overhead-cancelled IterTimer. The winner list feeds the gating
heuristic in models/gnn.py:Grapher.

Run on the real TPU: python scripts/profile_fused_grapher.py [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# single blocks run 0.04-1.3 ms/batch - at the bench's 8/24 lengths the
# two-length difference drowns in multi-ms transport jitter (negative
# times observed); push the differenced span to ~900 iterations
LO, HI, REPS = 128, 1024, 3
STAGES = [(1024, 64), (512, 128), (256, 256), (128, 512)]


def main():
    import jax
    import jax.numpy as jnp

    from grafp_tpu.models.gnn import Grapher
    from grafp_tpu.utils.profiling import IterTimer

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    print(f"backend={jax.default_backend()} B={b} dtype={dt.__name__}")

    for n, c in STAGES:
        x = jax.random.normal(jax.random.key(0), (b, n, c), jnp.float32)
        x = x.astype(dt)
        row = {}
        for name, fuse in (("fused", "on"), ("unfused", "off")):
            g = Grapher(c, k=3, knn_strategy="pallas", dtype=dt,
                        fuse_serving=fuse)
            v = g.init({"params": jax.random.key(1)}, x, False)

            def fwd(xx, g=g, v=v):
                return g.apply(v, xx, False)

            timer = IterTimer(fwd, x)
            t0 = time.time()
            timer.run(HI)
            compile_s = time.time() - t0
            times = {i: min(timer.run(i) for _ in range(REPS))
                     for i in (LO, HI)}
            per = (times[HI] - times[LO]) / (HI - LO)
            row[name] = per
            print(f"  N={n:5d} C={c:4d} {name:8s} {per * 1e3:8.3f} ms/batch "
                  f"= {per / b * 1e6:6.2f} us/item (compile {compile_s:.0f}s)")
        speed = row["unfused"] / row["fused"]
        print(f"  N={n:5d} C={c:4d} -> fused is {speed:.3f}x "
              f"({'WIN' if speed > 1 else 'LOSS'})")


if __name__ == "__main__":
    main()
