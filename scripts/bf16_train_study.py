"""bf16 vs f32 end-to-end TRAINING numerics study (COVERAGE known gap).

Serving-path bf16 fidelity is already proven (cos >= 0.998 per
fingerprint vs f32, tests/test_bf16_quality.py). This studies the
training side: same init, same data/augment/droppath streams, N steps
under compute_dtype float32 vs bfloat16; reports the loss trajectories,
their divergence, and the cosine between the two runs' fingerprints on
a held-out batch.

Run on the real TPU: python scripts/bf16_train_study.py [steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def run(dtype: str, steps: int, banks, xi, xj, xeval):
    from grafp_tpu.core.config import Config
    from grafp_tpu.dsp.melspec import LogMelConfig, log_mel_spectrogram
    from grafp_tpu.models import build_model
    from grafp_tpu.train import create_train_state, make_train_step

    cfg = Config(compute_dtype=dtype)
    model = build_model(cfg)
    # identical param init across dtypes: flax initializers run in f32
    state = create_train_state(model, cfg, jax.random.key(0), steps)
    step = make_train_step(model, cfg, banks, donate=False)
    losses = []
    t0 = time.time()
    for i in range(steps):
        state, m = step(state, xi, xj, jax.random.key(1000 + i))
        losses.append(float(m["loss"]))
    dt = time.time() - t0
    mcfg = LogMelConfig.from_config(cfg)
    spec = log_mel_spectrogram(xeval, mcfg)
    _, z = jax.jit(lambda s: model.apply(
        {"params": state.params, "batch_stats": state.batch_stats}, s, False
    ))(spec)
    return np.asarray(losses), np.asarray(z, np.float32), dt


def main():
    from grafp_tpu.dsp.augment import AugmentBanks

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    rng = np.random.RandomState(0)
    banks = AugmentBanks.from_arrays(
        noise_clips=[rng.randn(64000).astype(np.float32) for _ in range(8)],
        ir_clips=[np.r_[1.0, rng.randn(8000) * 0.05].astype(np.float32)
                  for _ in range(4)],
        noise_len=64000, ir_len=8192,
    )
    xi = jnp.asarray(rng.randn(64, 16000).astype(np.float32))
    xj = jnp.asarray(rng.randn(64, 16000).astype(np.float32))
    xeval = jnp.asarray(rng.randn(32, 16000).astype(np.float32))

    print(f"backend={jax.default_backend()} steps={steps}", flush=True)
    l32, z32, t32 = run("float32", steps, banks, xi, xj, xeval)
    print(f"[f32 ] {t32:.0f}s  loss[0]={l32[0]:.4f} "
          f"loss[-1]={l32[-1]:.4f}", flush=True)
    l16, z16, t16 = run("bfloat16", steps, banks, xi, xj, xeval)
    print(f"[bf16] {t16:.0f}s  loss[0]={l16[0]:.4f} "
          f"loss[-1]={l16[-1]:.4f}", flush=True)

    rel = np.abs(l16 - l32) / np.maximum(np.abs(l32), 1e-6)
    cos = np.sum(z16 * z32, -1) / (
        np.linalg.norm(z16, axis=-1) * np.linalg.norm(z32, axis=-1)
    )
    print(f"loss |rel diff|: mean {rel.mean():.4f} max {rel.max():.4f} "
          f"final {rel[-1]:.4f}", flush=True)
    print(f"trained-fingerprint cosine bf16-vs-f32 runs: "
          f"min {cos.min():.4f} mean {cos.mean():.4f}", flush=True)
    print(f"last-10-step mean loss: f32 {l32[-10:].mean():.4f} "
          f"bf16 {l16[-10:].mean():.4f}", flush=True)


if __name__ == "__main__":
    main()
