"""Waveform augmentations as jit-able JAX ops.

TPU-native equivalent of the reference's torch-audiomentations CPU chain
(modules/transformations.py:25-48): per-example impulse-response
convolution (room reverb) followed by SNR-calibrated background-noise
mixing. The reference runs these in dataloader worker processes and is
input-bound there (SURVEY.md §7 hard part 5); here they run on device,
batched, fused by XLA with the log-mel frontend.

Semantics matched to torch-audiomentations:
  * ApplyImpulseResponse: y = full-convolution(x, ir) truncated to the
    input length; applied with probability p per example.
  * AddBackgroundNoise: snr ~ U[min_snr_db, max_snr_db] per example;
    noise scaled so rms(x)/rms(scaled_noise) == 10^(snr/20); applied with
    probability p per example. rms is sqrt(mean(x^2)) over the snippet.

Noise/IR corpora live on device as fixed-shape banks (`AugmentBanks`);
per-example clip + offset selection happens inside jit via jax.random, so
the whole train-step input pipeline is one compiled program.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _next_pow2(n: int) -> int:
    return 1 << (int(n - 1).bit_length())


def apply_ir(x: jnp.ndarray, ir: jnp.ndarray) -> jnp.ndarray:
    """FFT convolution of audio with an impulse response, trimmed to the
    audio length (torch-audiomentations ApplyImpulseResponse semantics).

    x: (..., T) audio; ir: (..., L) impulse response (zero-padded rows are
    fine - they contribute nothing). Returns (..., T).
    """
    t, l = x.shape[-1], ir.shape[-1]
    n = _next_pow2(t + l - 1)
    xf = jnp.fft.rfft(x, n=n, axis=-1)
    hf = jnp.fft.rfft(ir, n=n, axis=-1)
    y = jnp.fft.irfft(xf * hf, n=n, axis=-1)
    return y[..., :t].astype(x.dtype)


def _rms(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return jnp.sqrt(jnp.mean(jnp.square(x), axis=-1) + eps)


def mix_noise_at_snr(
    x: jnp.ndarray, noise: jnp.ndarray, snr_db: jnp.ndarray
) -> jnp.ndarray:
    """Add noise at a given per-example SNR (dB). x,(...,T) noise,(...,T),
    snr_db broadcastable to (...,). Silent noise rows pass x through."""
    x_rms = _rms(x)
    n_rms = _rms(noise)
    gain = x_rms / (n_rms * (10.0 ** (snr_db / 20.0)))
    gain = jnp.where(n_rms < 1e-9, 0.0, gain)
    return x + gain[..., None] * noise


@dataclass
class AugmentBanks:
    """Fixed-shape on-device corpora for jit-time augmentation sampling.

    noise: (n_noise, noise_len) float32 - each row one background-noise
        clip, looped/zero-padded to noise_len (>= clip length + slack).
    ir:    (n_ir, ir_len) float32 - each row one impulse response,
        zero-padded to ir_len.
    noise_valid / ir_valid: true sample counts per row (for offset draws).
    """

    noise: Optional[jnp.ndarray] = None
    ir: Optional[jnp.ndarray] = None
    noise_valid: Optional[jnp.ndarray] = None
    ir_valid: Optional[jnp.ndarray] = None

    @staticmethod
    def from_arrays(
        noise_clips: Optional[list] = None,
        ir_clips: Optional[list] = None,
        noise_len: int = 0,
        ir_len: int = 0,
    ) -> "AugmentBanks":
        """Build banks from ragged host arrays (lists of 1-D np arrays).

        Noise rows shorter than noise_len are tiled (looped) to fill, the
        torch-audiomentations behavior for short background files; IR rows
        are zero-padded (reverb tails end anyway).
        """
        def _pack(clips, length, loop):
            if not clips:
                return None, None
            if length == 0:
                length = max(len(c) for c in clips)
            rows, valid = [], []
            for c in clips:
                c = np.asarray(c, np.float32).reshape(-1)
                if len(c) == 0:
                    c = np.zeros(1, np.float32)
                if loop and len(c) < length:
                    reps = -(-length // len(c))
                    c = np.tile(c, reps)
                c = c[:length]
                valid.append(len(c))
                if len(c) < length:
                    c = np.pad(c, (0, length - len(c)))
                rows.append(c)
            return jnp.asarray(np.stack(rows)), jnp.asarray(np.array(valid, np.int32))

        noise, noise_valid = _pack(noise_clips, noise_len, loop=True)
        ir, ir_valid = _pack(ir_clips, ir_len, loop=False)
        return AugmentBanks(noise=noise, ir=ir, noise_valid=noise_valid, ir_valid=ir_valid)


def _sample_noise(
    banks: AugmentBanks, key: jax.Array, batch: int, t: int
) -> jnp.ndarray:
    """Draw (batch, t) noise snippets: random clip row + random offset."""
    k_row, k_off = jax.random.split(key)
    n_rows, row_len = banks.noise.shape
    rows = jax.random.randint(k_row, (batch,), 0, n_rows)
    max_off = jnp.maximum(banks.noise_valid[rows] - t, 1)
    offs = jax.random.randint(k_off, (batch,), 0, 2 ** 30) % max_off
    idx = offs[:, None] + jnp.arange(t)[None, :]
    return jax.vmap(lambda r, i: banks.noise[r][i])(rows, idx)


def augment_waveforms(
    x: jnp.ndarray,
    banks: AugmentBanks,
    key: jax.Array,
    snr_range: Tuple[float, float],
    ir_prob: float = 1.0,
    noise_prob: float = 1.0,
) -> jnp.ndarray:
    """Full train/val corruption chain on a batch (B, T): IR convolution
    with prob ir_prob, then background noise at snr ~ U[snr_range] with
    prob noise_prob (reference transformations.py:25-48 ordering)."""
    b, t = x.shape
    k_ir_row, k_ir_p, k_n, k_snr, k_np = jax.random.split(key, 5)
    y = x
    if banks.ir is not None and ir_prob > 0:
        rows = jax.random.randint(k_ir_row, (b,), 0, banks.ir.shape[0])
        irs = banks.ir[rows]
        convolved = apply_ir(y, irs)
        take = jax.random.uniform(k_ir_p, (b,)) < ir_prob
        y = jnp.where(take[:, None], convolved, y)
    if banks.noise is not None and noise_prob > 0:
        noise = _sample_noise(banks, k_n, b, t)
        snr = jax.random.uniform(
            k_snr, (b,), minval=snr_range[0], maxval=snr_range[1]
        )
        noised = mix_noise_at_snr(y, noise, snr)
        take = jax.random.uniform(k_np, (b,)) < noise_prob
        y = jnp.where(take[:, None], noised, y)
    return y
