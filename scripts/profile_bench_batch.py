"""Full-model throughput vs batch size, overhead-cancelled.

Round-1 recorded strong "anti-scaling" (9.4k fp/s at B<=64 -> 5.6k at
B=1024), but that measurement divided a fixed ~31 ms remote dispatch+
fetch round trip by iters*batch, flattering small batches. This sweep
uses scan_time_per_iter (difference of two scan lengths; fixed costs
cancel exactly) to get the true per-item cost per batch size.

Run on the real TPU: python scripts/profile_bench_batch.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

BATCHES = (32, 64, 128, 256, 512)


def main():
    from grafp_tpu.core.config import Config
    from grafp_tpu.dsp.melspec import LogMelConfig, log_mel_spectrogram
    from grafp_tpu.models import build_model
    from grafp_tpu.utils.profiling import scan_time_per_iter

    cfg = Config(compute_dtype="bfloat16")
    model = build_model(cfg)
    mcfg = LogMelConfig.from_config(cfg)
    v = model.init({"params": jax.random.key(0)},
                   jnp.zeros((1, cfg.n_mels, cfg.n_frames)), False)

    def fingerprint(waves):
        spec = log_mel_spectrogram(waves, mcfg)
        _, z = model.apply(v, spec, False)
        return z

    print(f"backend={jax.default_backend()}", flush=True)
    print(f"{'B':>5s} {'ms/batch':>9s} {'us/item':>8s} {'fp/s':>8s} "
          f"{'overhead_ms':>11s}", flush=True)
    for b in BATCHES:
        # keep the hi-scan total device time roughly constant (~0.5 s)
        hi = max(8, min(80, int(0.5 / (b * 75e-6))))
        lo = max(2, hi // 5)
        waves = jax.random.normal(jax.random.key(1), (b, cfg.clip_frames),
                                  jnp.float32)
        r = scan_time_per_iter(fingerprint, waves, iters_lo=lo, iters_hi=hi)
        dt = r["per_iter_s"]
        print(f"{b:5d} {dt*1e3:9.2f} {dt/b*1e6:8.1f} {b/dt:8,.0f} "
              f"{r['fixed_overhead_s']*1e3:11.1f}", flush=True)


if __name__ == "__main__":
    main()
