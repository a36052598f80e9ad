"""Augment-path timing: jnp.fft IR convolution vs the MXU-native
partitioned overlap-add GEMM (dsp/augment.py:apply_ir_os).

Round-3 backward profile (scripts/profile_train_backward.py) measured
the device augment at 46.9 ms of the 256.5 ms B=256 train step - all of
it the TPU's slow jnp.fft path (3 big FFTs at 32k+ points). This script
times both implementations at production shapes (B=256, T=16000,
IR bank 2 s = 32,000 taps) plus the noise-mix stage.

Run on the real TPU: python scripts/profile_augment.py [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

LO, HI, REPS = 4, 16, 2


def stage(name, body, x):
    from grafp_tpu.utils.profiling import IterTimer

    timer = IterTimer(body, x)
    t0 = time.time()
    timer.run(HI)
    compile_s = time.time() - t0
    times = {}
    for iters in (LO, HI):
        times[iters] = min(timer.run(iters) for _ in range(REPS))
    per = (times[HI] - times[LO]) / (HI - LO)
    print(f"{name:28s} {per * 1e3:8.2f} ms  (compile {compile_s:5.1f}s)",
          flush=True)
    return per


def main():
    import dataclasses

    from grafp_tpu.dsp.augment import AugmentBanks, augment_waveforms

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rng = np.random.RandomState(0)
    banks = AugmentBanks.from_arrays(
        noise_clips=[rng.randn(64000).astype(np.float32) for _ in range(8)],
        ir_clips=[np.r_[1.0, rng.randn(31999) * 0.05].astype(np.float32)
                  for _ in range(4)],
        noise_len=64000, ir_len=32000,
    )
    no_spec = dataclasses.replace(banks, ir_spec_re=None, ir_spec_im=None)
    x = jnp.asarray(rng.randn(b, 16000).astype(np.float32))
    key = jax.random.key(7)
    snr = (0.0, 20.0)
    print(f"backend={jax.default_backend()} B={b} T=16000 L=32000",
          flush=True)

    stage("augment (GEMM overlap-add)",
          lambda w: augment_waveforms(w, banks, key, snr, 1.0, 1.0), x)
    stage("augment (jnp.fft)",
          lambda w: augment_waveforms(w, no_spec, key, snr, 1.0, 1.0), x)
    stage("noise mix only",
          lambda w: augment_waveforms(w, banks, key, snr, 0.0, 1.0), x)


if __name__ == "__main__":
    main()
