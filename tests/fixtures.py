"""Synthetic audio fixtures (no real fma/MUSAN data in this environment)."""

import os

import numpy as np

from grafp_tpu.data.audio_io import save_wav


def make_wav_dir(
    path: str,
    n: int = 8,
    dur_s: float = 4.0,
    sr: int = 16000,
    seed: int = 0,
    kind: str = "music",
) -> list:
    """Write n deterministic wav files; returns their paths.

    'music' = sums of harmonics with envelopes (distinct per file, so
    fingerprints are discriminative); 'noise' = filtered noise; 'ir' =
    exponentially-decaying sparse impulse responses.
    """
    os.makedirs(path, exist_ok=True)
    rng = np.random.RandomState(seed)
    t = np.arange(int(dur_s * sr)) / sr
    out = []
    for i in range(n):
        if kind == "music":
            f0 = 110 * (2 ** (rng.randint(0, 24) / 12.0))
            x = sum(
                a * np.sin(2 * np.pi * f0 * (h + 1) * t + rng.rand() * 6.28)
                for h, a in enumerate(rng.rand(5) / np.arange(1, 6))
            )
            env = 0.5 + 0.5 * np.sin(2 * np.pi * rng.uniform(0.3, 2.0) * t)
            x = (x * env + 0.02 * rng.randn(len(t))) * 0.3
        elif kind == "noise":
            x = rng.randn(len(t)) * 0.2
            k = rng.randint(2, 30)
            x = np.convolve(x, np.ones(k) / k, mode="same")
        elif kind == "ir":
            x = np.zeros(int(0.25 * sr))
            x[0] = 1.0
            taps = rng.randint(1, len(x), 20)
            x[taps] = rng.randn(20) * np.exp(-taps / (0.05 * sr))
        else:
            raise ValueError(kind)
        p = os.path.join(path, f"{kind}_{i:03d}.wav")
        save_wav(p, x / (np.abs(x).max() + 1e-9) * 0.8, sr)
        out.append(p)
    return out
