"""Full-forward timing: f32 vs bf16 vs folded-BN on the real TPU.
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

from grafp_tpu.core.config import Config
from grafp_tpu.dsp.melspec import LogMelConfig, log_mel_spectrogram
from grafp_tpu.models import build_model
from grafp_tpu.models.fold_bn import fold_batch_norms, neutral_batch_stats

B, ITERS = 256, 20


def run_variant(name, cfg, params, stats):
    model = build_model(cfg)
    mcfg = LogMelConfig.from_config(cfg)

    @jax.jit
    def loop(params, stats, key):
        def body(c, i):
            w = jax.random.normal(jax.random.fold_in(key, i), (B, 16000))
            spec = log_mel_spectrogram(w, mcfg)
            _, z = model.apply({"params": params, "batch_stats": stats},
                               spec, False)
            return c + jnp.sum(z), None

        t, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
        return t

    t0 = time.time()
    float(loop(params, stats, jax.random.key(0)))
    c = time.time() - t0
    t0 = time.time()
    float(loop(params, stats, jax.random.key(1)))
    dt = (time.time() - t0) / ITERS
    print(f"{name:28s} {dt*1e3:7.2f} ms/batch  ({B/dt:,.0f} fps)  compile {c:.0f}s",
          flush=True)


def main():
    cfg32 = Config(compute_dtype="float32")
    model = build_model(cfg32)
    v = model.init({"params": jax.random.key(0)}, jnp.zeros((1, 64, 32)), False)
    params, stats = v["params"], v["batch_stats"]
    stats = jax.tree.map(
        lambda x: jnp.asarray(
            0.3 + np.abs(np.random.RandomState(0).randn(*x.shape)), jnp.float32
        ) if x.shape else x, stats,
    )

    run_variant("f32", cfg32, params, stats)
    run_variant("bf16", Config(compute_dtype="bfloat16"), params, stats)
    folded = fold_batch_norms(params, stats)
    neutral = neutral_batch_stats(stats)
    run_variant("bf16 + folded BN",
                Config(compute_dtype="bfloat16"), folded, neutral)
    run_variant("f32 + folded BN", cfg32, folded, neutral)


if __name__ == "__main__":
    main()
