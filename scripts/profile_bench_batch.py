"""Fingerprint throughput vs batch size (headline tuning)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from grafp_tpu.core.config import Config
from grafp_tpu.dsp.melspec import LogMelConfig, log_mel_spectrogram
from grafp_tpu.models import build_model

cfg = Config(compute_dtype="bfloat16")
model = build_model(cfg)
mcfg = LogMelConfig.from_config(cfg)
v = model.init({"params": jax.random.key(0)}, jnp.zeros((1, 64, 32)), False)
params, bs = v["params"], v["batch_stats"]

for B in (128, 256, 512, 1024):
    iters = max(4, 2048 // B)
    @jax.jit
    def run(params, bs, key, B=B, iters=iters):
        def body(c, i):
            w = jax.random.normal(jax.random.fold_in(key, i), (B, 16000))
            spec = log_mel_spectrogram(w, mcfg)
            _, z = model.apply({"params": params, "batch_stats": bs}, spec, False)
            return c + jnp.sum(z), None
        t, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return t
    t0 = time.time(); float(run(params, bs, jax.random.key(0))); c = time.time() - t0
    t0 = time.time(); float(run(params, bs, jax.random.key(1)))
    dt = (time.time() - t0) / iters
    print(f"B={B:5d}: {dt*1e3:7.2f} ms/batch  {B/dt:9,.0f} fp/s  (compile {c:.0f}s)", flush=True)
