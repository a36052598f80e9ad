"""Component-level TPU timing: find where the 252 ms/batch forward goes.

Each candidate op runs REPS times inside one jitted scan with a value
dependency chain; sync is via scalar fetch (see bench.py note).
Run: python scripts/profile_components.py

NOTE (round 2): timings in this script predate scan_time_per_iter and
include the remote transport's fixed ~31 ms dispatch+fetch cost; treat
absolute numbers as upper bounds (relative comparisons at equal batch
and iteration counts remain valid). See utils/profiling.scan_time_per_iter.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B, N, C, K = 256, 1024, 64, 9
REPS = 10


def timed(name, fn, *args):
    run = jax.jit(fn)
    t0 = time.time()
    float(run(*args))
    compile_s = time.time() - t0
    t0 = time.time()
    float(run(*args))
    t = (time.time() - t0) / REPS * 1e3
    print(f"{name:42s} {t:8.2f} ms/iter   (compile {compile_s:.0f}s)")
    return t


def chain(body):
    """Run body REPS times with a scalar dependency chain."""

    def fn(x, s0):
        def step(c, i):
            out = body(x + c * 1e-20)
            return jnp.sum(out).astype(jnp.float32) * 1e-20 + c, None

        s, _ = jax.lax.scan(step, s0, jnp.arange(REPS))
        return s

    return fn


def main():
    rng = np.random.RandomState(0)
    x32 = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    x16 = x32.astype(jnp.bfloat16)
    s0 = jnp.float32(0)

    print(f"backend={jax.default_backend()}  B={B} N={N} C={C} K={K} reps={REPS}")

    timed("sim matmul f32 (B,N,N)", chain(
        lambda x: jnp.einsum("bnc,bmc->bnm", x, x, preferred_element_type=jnp.float32)
    ), x32, s0)
    timed("sim matmul bf16", chain(
        lambda x: jnp.einsum("bnc,bmc->bnm", x, x, preferred_element_type=jnp.float32)
    ), x16, s0)
    timed("sim + lax.top_k(9)[1]", chain(
        lambda x: jax.lax.top_k(
            jnp.einsum("bnc,bmc->bnm", x, x, preferred_element_type=jnp.float32), K
        )[1]
    ), x32, s0)
    timed("sim + approx_max_k(9)", chain(
        lambda x: jax.lax.approx_max_k(
            jnp.einsum("bnc,bmc->bnm", x, x, preferred_element_type=jnp.float32), K
        )[1]
    ), x32, s0)

    idx = jnp.asarray(rng.randint(0, N, size=(B, N, K)).astype(np.int32))

    def gather_max(x):
        nb = jnp.take_along_axis(x[:, :, None, :], idx[..., None], axis=1)
        return jnp.max(nb, axis=2) - x

    timed("gather(B,N,K,C) + max", chain(gather_max), x32, s0)

    def grouped_conv(x):
        w = jnp.ones((4, 2 * C // 4, 2 * C // 4), jnp.float32)
        y = jnp.stack([x, x], -1).reshape(B, N, 2 * C)
        yg = y.reshape(B, N, 4, 2 * C // 4)
        return jnp.einsum("bngi,gio->bngo", yg, w, preferred_element_type=jnp.float32)

    timed("interleave + grouped conv", chain(grouped_conv), x32, s0)

    def pointwise(x):
        w = jnp.ones((C, 4 * C), jnp.float32)
        return jnp.einsum("bnc,cd->bnd", x, w, preferred_element_type=jnp.float32)

    timed("pointwise C->4C", chain(pointwise), x32, s0)

    # DSP front
    waves = jnp.asarray(rng.randn(B, 16000).astype(np.float32))
    from grafp_tpu.dsp.melspec import LogMelConfig, log_mel_spectrogram

    timed("logmel matmul-DFT (B,16000)", chain(
        lambda w: log_mel_spectrogram(w, LogMelConfig())
    ), waves, s0)
    timed("logmel fft (B,16000)", chain(
        lambda w: log_mel_spectrogram(w, LogMelConfig(method="fft"))
    ), waves, s0)

    # peak embed conv
    spec = jnp.asarray(rng.randn(B, 64, 32).astype(np.float32))
    from grafp_tpu.models.peak_embed import PeakEmbed

    pe = PeakEmbed()
    pvars = pe.init(jax.random.key(0), spec)
    timed("peak embed conv7x7", chain(lambda s: pe.apply(pvars, s)), spec, s0)

    # full grapher + ffn at every stage shape (onehot strategy)
    from grafp_tpu.models.gnn import FFN, Grapher

    for (n, c) in ((1024, 64), (512, 128), (256, 256), (128, 512)):
        xs = jnp.asarray(rng.randn(B, n, c).astype(np.float32))
        g = Grapher(features=c, k=3)
        gvars = g.init(jax.random.key(0), xs, False)
        timed(f"Grapher N={n} C={c} onehot", chain(
            lambda x, g=g, v=gvars: g.apply(v, x, False)
        ), xs, s0)
        f = FFN(features=c, hidden=4 * c)
        fvars = f.init(jax.random.key(0), xs, False)
        timed(f"FFN     N={n} C={c}", chain(
            lambda x, f=f, v=fvars: f.apply(v, x, False)
        ), xs, s0)


if __name__ == "__main__":
    main()
