"""Is flax BatchNorm's train mode leaving HBM bandwidth on the table?

Round-3 measurement (scripts/profile_fwd_gap.py): train-mode forward
runs 116.0 us/item vs 75.5 eval at 2B=512 - a 40.5 us/item gap whose
only structural difference is BN batch statistics (DropPath is rate-0).
The jnp floor for train BN is ~2 extra bf16 reads of the activation per
BN (stats pass + normalize pass that eval folds into the producer):
64 BN sites x 0.26 MB/item ~ 20 us/item. This microbench times a
stage-1-shaped stack of [Dense C->C + BN + relu] x DEPTH in:

    eval       running stats (the fusion-friendly baseline)
    flax       nn.BatchNorm train mode
    fused      custom stats: jnp reductions with f32 accumulation read
               the bf16 input directly (no astype pre-cast), normalize
               in scale/shift form y = x*s + t (one fused FMA pass)

fwd and fwd+bwd each. If fused ~= flax, the gap is intrinsic (the
stats reductions themselves); if fused < flax, wire the fused path into
models/layers.BatchNorm.

Run on the real TPU: python scripts/profile_bn.py [B N C DEPTH]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

LO, HI, REPS = 4, 12, 2


def timeit(name, body, x):
    from grafp_tpu.utils.profiling import IterTimer

    timer = IterTimer(body, x)
    t0 = time.time()
    timer.run(HI)
    compile_s = time.time() - t0
    times = {}
    for iters in (LO, HI):
        times[iters] = min(timer.run(iters) for _ in range(REPS))
    per = (times[HI] - times[LO]) / (HI - LO)
    print(f"{name:18s} {per * 1e3:8.3f} ms  (compile {compile_s:5.1f}s)",
          flush=True)
    return per


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    c = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    depth = int(sys.argv[4]) if len(sys.argv) > 4 else 6

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, n, c).astype(np.float32)).astype(jnp.bfloat16)
    w = [jnp.asarray(rng.randn(c, c).astype(np.float32) / np.sqrt(c)
                     ).astype(jnp.bfloat16) for _ in range(depth)]
    gamma = jnp.ones((depth, c), jnp.float32)
    beta = jnp.zeros((depth, c), jnp.float32)
    rmean = jnp.zeros((depth, c), jnp.float32)
    rvar = jnp.ones((depth, c), jnp.float32)

    print(f"backend={jax.default_backend()} ({b},{n},{c}) x{depth} layers "
          f"bf16", flush=True)

    def bn_eval(h, i):
        s = (gamma[i] * jax.lax.rsqrt(rvar[i] + 1e-5)).astype(jnp.bfloat16)
        t = (beta[i] - rmean[i] * gamma[i]
             * jax.lax.rsqrt(rvar[i] + 1e-5)).astype(jnp.bfloat16)
        return h * s + t

    def bn_flax(h, i):
        # what nn.BatchNorm does in train mode: f32-cast stats, then
        # normalize at the module dtype
        h32 = h.astype(jnp.float32)
        mean = jnp.mean(h32, axis=(0, 1))
        var = jnp.mean(h32 * h32, axis=(0, 1)) - mean * mean
        mul = (jax.lax.rsqrt(var + 1e-5) * gamma[i]).astype(jnp.bfloat16)
        return (h - mean.astype(jnp.bfloat16)) * mul \
            + beta[i].astype(jnp.bfloat16)

    def bn_fused(h, i):
        # f32-accumulating reductions reading bf16 directly; scale/shift
        mean = jnp.mean(h, axis=(0, 1), dtype=jnp.float32)
        msq = jnp.mean(jnp.square(h.astype(jnp.float32)), axis=(0, 1))
        var = msq - mean * mean
        s = (jax.lax.rsqrt(var + 1e-5) * gamma[i])
        t = beta[i] - mean * s
        return h * s.astype(jnp.bfloat16) + t.astype(jnp.bfloat16)

    def make_net(bn):
        def net(h):
            for i in range(depth):
                h = jnp.dot(h, w[i], preferred_element_type=jnp.bfloat16)
                h = bn(h, i)
                h = jax.nn.relu(h)
            return jnp.sum(h.astype(jnp.float32) ** 2)
        return net

    for name, bn in (("eval", bn_eval), ("flax-train", bn_flax),
                     ("fused-train", bn_fused)):
        timeit(f"fwd {name}", make_net(bn), x)

    for name, bn in (("eval", bn_eval), ("flax-train", bn_flax),
                     ("fused-train", bn_fused)):
        net = make_net(bn)
        timeit(f"fwd+bwd {name}", lambda h: jnp.sum(jax.grad(
            lambda hh: net(hh))(h).astype(jnp.float32) ** 2), x)


if __name__ == "__main__":
    main()
