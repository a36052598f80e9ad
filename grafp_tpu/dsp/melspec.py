"""Log-mel spectrogram frontend, TPU-native.

Numerics-parity target: the reference's torchaudio pipeline
``MelSpectrogram(fs, win_len, hop_len, n_fft, n_mels) + AmplitudeToDB()``
(reference modules/transformations.py:50-57) with torchaudio defaults:
center=True, pad_mode='reflect', periodic Hann window, power=2.0,
HTK mel scale, no filterbank norm, f_min=0, f_max=fs/2, AmplitudeToDB
in power mode (10*log10, amin=1e-10, ref=1, no top_db clamp). The 128-d
fingerprint parity budget (BASELINE.md) hinges on these exact choices.

Two compute paths, numerically equivalent (see tests/test_melspec.py):

* ``method='matmul'`` (default): frames -> real DFT expressed as two
  matmuls with precomputed cos/sin bases -> |.|^2 -> mel projection
  matmul. Every FLOP lands on the MXU and XLA fuses the elementwise
  square/add/log chain into the matmul epilogue. The DFT matrices for
  n_fft=1024 are 2 x (1024 x 513) f32 ~ 4 MB - resident in VMEM across
  grid steps. This is the GEMM-native frontend strategy (cf. PAPERS.md
  "MelT: GEMM-native NDFT").

* ``method='fft'``: jnp.fft.rfft reference path (used for cross-checks
  and on CPU).

Static shapes only: the segment count is a function of the (padded)
input length, so jit sees one shape per bucket.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Filterbank / window construction (host-side, cached)
# ---------------------------------------------------------------------------

def _hz_to_mel_htk(f: np.ndarray) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def _mel_to_hz_htk(m: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=16)
def mel_filterbank(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    f_min: float = 0.0,
    f_max: float | None = None,
) -> np.ndarray:
    """Triangular HTK mel filterbank, (n_freqs, n_mels), float32.

    Matches torchaudio.functional.melscale_fbanks(norm=None,
    mel_scale='htk') including its integer-division Nyquist grid
    (``linspace(0, sample_rate // 2, n_freqs)``).
    """
    if f_max is None:
        f_max = float(sample_rate) / 2.0
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(_hz_to_mel_htk(f_min), _hz_to_mel_htk(f_max), n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]                       # (n_mels+1,)
    slopes = f_pts[None, :] - all_freqs[:, None]          # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=16)
def _hann_window(win_length: int, n_fft: int) -> np.ndarray:
    """Periodic Hann of win_length, zero-padded symmetrically to n_fft
    (torch.hann_window(periodic=True) + torchaudio's center pad)."""
    n = np.arange(win_length, dtype=np.float64)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))
    if win_length < n_fft:
        left = (n_fft - win_length) // 2
        out = np.zeros(n_fft)
        out[left:left + win_length] = w
        w = out
    return w.astype(np.float32)


@functools.lru_cache(maxsize=16)
def _rdft_bases(n_fft: int, win_length: int) -> Tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT cos/sin bases, each (n_fft, n_fft//2+1) f32.

    X_k = sum_n x_n w_n e^{-2 pi i k n / N}: folding the analysis window
    into the basis saves one elementwise pass over the frames.
    """
    n_freqs = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_freqs, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    w = _hann_window(win_length, n_fft).astype(np.float64)[:, None]
    return (
        (np.cos(ang) * w).astype(np.float32),
        (-np.sin(ang) * w).astype(np.float32),
    )


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class LogMelConfig:
    sample_rate: int = 16000
    n_fft: int = 1024
    win_length: int = 1024
    hop_length: int = 512
    n_mels: int = 64
    f_min: float = 0.0
    f_max: float | None = None
    power: float = 2.0
    amin: float = 1e-10          # AmplitudeToDB clamp floor
    top_db: float | None = None  # reference uses AmplitudeToDB() default: None
    method: str = "matmul"       # 'matmul' | 'fft'
    center: bool = True          # False: caller pre-padded (fp builder)
    compute_dtype: str = "float32"

    @classmethod
    def from_config(cls, cfg, method: str = "matmul") -> "LogMelConfig":
        return cls(
            sample_rate=cfg["fs"],
            n_fft=cfg["n_fft"],
            win_length=cfg["win_len"],
            hop_length=cfg["hop_len"],
            n_mels=cfg["n_mels"],
            method=method,
        )

    def num_frames(self, n_samples: int) -> int:
        """Frames for a centered STFT (torch.stft center=True)."""
        return 1 + n_samples // self.hop_length


# ---------------------------------------------------------------------------
# Core
# ---------------------------------------------------------------------------

def _frame(x: jnp.ndarray, n_fft: int, hop: int, center: bool = True) -> jnp.ndarray:
    """(..., T) -> (..., n_frames, n_fft) with reflect center-padding.
    center=False assumes the caller already padded (fp builder's exact
    tail handling for bucketed track lengths)."""
    if center:
        pad = n_fft // 2
        pad_width = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        xp = jnp.pad(x, pad_width, mode="reflect")
    else:
        xp = x
    t_padded = xp.shape[-1]
    n_frames = 1 + (t_padded - n_fft) // hop
    if n_fft % hop == 0:
        # hop divides n_fft (512 | 1024 here): frames are runs of k
        # consecutive hop-sized chunks, so build them with k static
        # slices + one concat — pure data movement XLA fuses away. The
        # jnp.take fallback below is a real gather, measured at ~0.9
        # us/item of the 1.37 us/item production logmel
        # (scripts/profile_tail_pools.py).
        k = n_fft // hop
        n_chunks = t_padded // hop
        c = xp[..., : n_chunks * hop]
        c = c.reshape(*xp.shape[:-1], n_chunks, hop)
        assert n_chunks - k + 1 == n_frames, (n_chunks, k, n_frames)
        return jnp.concatenate(
            [c[..., i:n_chunks - k + 1 + i, :] for i in range(k)], axis=-1
        )
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]   # (n_frames, n_fft)
    return jnp.take(xp, idx, axis=-1)                     # (..., n_frames, n_fft)


def power_spectrogram(x: jnp.ndarray, mcfg: LogMelConfig) -> jnp.ndarray:
    """(..., T) -> (..., n_freqs, n_frames) power spectrogram (|STFT|^2)."""
    dtype = jnp.dtype(mcfg.compute_dtype)
    frames = _frame(x, mcfg.n_fft, mcfg.hop_length, mcfg.center)
    if mcfg.method == "fft":
        win = jnp.asarray(_hann_window(mcfg.win_length, mcfg.n_fft))
        spec = jnp.fft.rfft(frames * win, axis=-1)
        p = (spec.real ** 2 + spec.imag ** 2).astype(jnp.float32)
    else:
        cos_b, sin_b = _rdft_bases(mcfg.n_fft, mcfg.win_length)
        fr = frames.astype(dtype)
        re = jnp.matmul(fr, jnp.asarray(cos_b, dtype),
                        preferred_element_type=jnp.float32)
        im = jnp.matmul(fr, jnp.asarray(sin_b, dtype),
                        preferred_element_type=jnp.float32)
        p = re * re + im * im                              # (..., n_frames, n_freqs)
    if mcfg.power != 2.0:
        p = jnp.power(jnp.sqrt(p), mcfg.power)
    return jnp.swapaxes(p, -1, -2)                         # (..., n_freqs, n_frames)


def mel_spectrogram(x: jnp.ndarray, mcfg: LogMelConfig) -> jnp.ndarray:
    """(..., T) -> (..., n_mels, n_frames) mel-power spectrogram."""
    p = power_spectrogram(x, mcfg)                         # (..., F, T')
    fb = jnp.asarray(
        mel_filterbank(mcfg.n_fft // 2 + 1, mcfg.n_mels, mcfg.sample_rate,
                       mcfg.f_min, mcfg.f_max)
    )
    # (..., F, T') x (F, M) -> (..., M, T')
    return jnp.einsum("...ft,fm->...mt", p, fb,
                      preferred_element_type=jnp.float32)


def amplitude_to_db(p: jnp.ndarray, mcfg: LogMelConfig) -> jnp.ndarray:
    """Power -> dB, torchaudio AmplitudeToDB(stype='power') semantics:
    10*log10(clamp(x, amin)) - 10*log10(max(amin, ref=1)); the second term
    is zero for ref=1. top_db clamping (None in the reference) applies the
    max over each spectrogram's own peak."""
    db = 10.0 * jnp.log10(jnp.maximum(p, mcfg.amin))
    if mcfg.top_db is not None:
        peak = jnp.max(db, axis=(-2, -1), keepdims=True)
        db = jnp.maximum(db, peak - mcfg.top_db)
    return db


def log_mel_spectrogram(x: jnp.ndarray, mcfg: LogMelConfig) -> jnp.ndarray:
    """(..., T) audio -> (..., n_mels, n_frames) log-mel in dB.

    Equivalent of the reference's ``self.logmelspec``
    (modules/transformations.py:50-57). For 1 s @ 16 kHz with the grafp
    config this is (..., 64, 32).
    """
    return amplitude_to_db(mel_spectrogram(x, mcfg), mcfg)
