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

import functools
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

    NOTE: jnp.fft on TPU is slow (measured 46.9 ms for the B=256 train
    augment, ~18% of the whole step) - the production path precomputes
    partitioned IR spectra at bank build and runs the MXU-native GEMM
    overlap-add convolution (apply_ir_os) instead; this FFT form is the
    reference implementation and the fallback for ad-hoc IRs.
    """
    t, l = x.shape[-1], ir.shape[-1]
    n = _next_pow2(t + l - 1)
    xf = jnp.fft.rfft(x, n=n, axis=-1)
    hf = jnp.fft.rfft(ir, n=n, axis=-1)
    y = jnp.fft.irfft(xf * hf, n=n, axis=-1)
    return y[..., :t].astype(x.dtype)


# ---------------------------------------------------------------------------
# MXU-native IR convolution: uniform-partitioned overlap-add with the DFT
# as a GEMM (the dsp/melspec.py recipe, sized for convolution).
#
# The wave is framed into HOP-sample blocks (zero-padded to N = 2*HOP) and
# the IR into HOP-sample partitions whose spectra are PRECOMPUTED at bank
# build. A linear convolution of two <= HOP signals fits losslessly in an
# N-point circular convolution, so output block m is
#     y_blk[m] = sum_{j+p=m} idft( X[j] * H[p] )
# overlap-added at hop HOP (a polynomial product along the block axis).
# Everything lands on the MXU: one (B*blocks, HOP) @ (HOP, 2*bins) forward
# GEMM, a P-term complex multiply-accumulate, one (B*blocks, 2*bins) @
# (2*bins, N) inverse GEMM. ~51 GFLOP at B=256/T=16000/L=32000 ~ 1-2 ms vs
# 46.9 ms for jnp.fft on the same shapes (scripts/profile_augment.py).
# ---------------------------------------------------------------------------

HOP = 1024          # partition / frame size; N = 2048-point DFT
_N = 2 * HOP
_BINS = _N // 2 + 1


@functools.lru_cache(maxsize=4)
def _dft_mats(hop: int):
    """(fwd_re, fwd_im, inv) GEMM matrices for an N=2*hop rDFT of a
    hop-sample frame (the zero-padding is the matrix row slice).
    Cached as HOST arrays: caching jnp constants would leak tracers when
    the first call happens under a jit trace."""
    n = 2 * hop
    bins = n // 2 + 1
    t = np.arange(hop)[:, None]
    f = np.arange(bins)[None, :]
    ang = -2.0 * np.pi * t * f / n
    fwd_re = np.cos(ang).astype(np.float32)            # (hop, bins)
    fwd_im = np.sin(ang).astype(np.float32)
    # irfft as GEMM: y[t] = (1/n) sum_f w_f (re_f cos + (-im_f) sin ...)
    tt = np.arange(n)[None, :]
    ff = np.arange(bins)[:, None]
    c = np.cos(2.0 * np.pi * ff * tt / n)
    s = np.sin(2.0 * np.pi * ff * tt / n)
    w = np.full((bins, 1), 2.0)
    w[0] = 1.0
    w[-1] = 1.0
    inv = np.concatenate([w * c, -w * s], axis=0).astype(np.float32) / n
    return fwd_re, fwd_im, inv


def partitioned_ir_spectra(ir_bank: np.ndarray, hop: int = HOP
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Precompute per-row partition spectra of an IR bank.

    ir_bank: (n_ir, L) host array. Returns (re, im), each
    (n_ir, P, bins) float32 with P = ceil(L / hop) - computed once at
    bank build on the host (np.fft), gathered per example at train time.
    """
    ir_bank = np.asarray(ir_bank, np.float32)
    n_ir, l = ir_bank.shape
    p = -(-l // hop)
    padded = np.zeros((n_ir, p * hop), np.float32)
    padded[:, :l] = ir_bank
    parts = padded.reshape(n_ir, p, hop)
    spec = np.fft.rfft(parts, n=2 * hop, axis=-1)
    return (jnp.asarray(spec.real.astype(np.float32)),
            jnp.asarray(spec.imag.astype(np.float32)))


def apply_ir_os(x: jnp.ndarray, hf_re: jnp.ndarray, hf_im: jnp.ndarray,
                hop: int = HOP) -> jnp.ndarray:
    """Per-example IR convolution from precomputed partition spectra.

    x: (B, T); hf_re/hf_im: (B, P, bins) gathered partition spectra.
    Returns (B, T) = full linear convolution truncated to T, identical
    (to f32 rounding) to apply_ir / np.convolve (tests/test_segment_augment).
    """
    b, t = x.shape
    p = hf_re.shape[1]
    fwd_re, fwd_im, inv = _dft_mats(hop)
    nblk = -(-t // hop)
    pad = nblk * hop - t
    xf = jnp.pad(x, ((0, 0), (0, pad))).reshape(b, nblk, hop)
    # forward rDFT of every frame: one GEMM against the (hop, 2*bins) mat
    xr = jnp.matmul(xf, fwd_re, preferred_element_type=jnp.float32)
    xi = jnp.matmul(xf, fwd_im, preferred_element_type=jnp.float32)
    # polynomial product along the block axis: output block m sums
    # X[m-p] * H[p]; only blocks m < nblk contribute to y[:T]
    yr = jnp.zeros_like(xr)
    yi = jnp.zeros_like(xi)
    for pp in range(min(p, nblk)):
        xr_s = xr[:, : nblk - pp] if pp else xr
        xi_s = xi[:, : nblk - pp] if pp else xi
        hr = hf_re[:, pp][:, None, :]
        hi = hf_im[:, pp][:, None, :]
        tr = xr_s * hr - xi_s * hi
        ti = xr_s * hi + xi_s * hr
        if pp:
            tr = jnp.pad(tr, ((0, 0), (pp, 0), (0, 0)))
            ti = jnp.pad(ti, ((0, 0), (pp, 0), (0, 0)))
        yr = yr + tr
        yi = yi + ti
    # inverse rDFT (GEMM) -> (B, nblk, 2*hop), overlap-add at hop
    blocks = jnp.matmul(jnp.concatenate([yr, yi], axis=-1), inv,
                        preferred_element_type=jnp.float32)
    y = jnp.zeros((b, (nblk + 1) * hop), jnp.float32)
    y = y.at[:, : nblk * hop].add(blocks[..., :hop].reshape(b, -1))
    y = y.at[:, hop: (nblk + 1) * hop].add(blocks[..., hop:].reshape(b, -1))
    return y[:, :t].astype(x.dtype)


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
    # precomputed partitioned IR spectra (n_ir, P, bins) for the
    # MXU-native GEMM convolution (apply_ir_os); None -> jnp.fft fallback
    ir_spec_re: Optional[jnp.ndarray] = None
    ir_spec_im: Optional[jnp.ndarray] = None

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
            if loop:
                # noise rows are block-gathered at _LANE granularity
                length = -(-length // _LANE) * _LANE
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
        spec_re = spec_im = None
        if ir is not None:
            spec_re, spec_im = partitioned_ir_spectra(np.asarray(ir))
        return AugmentBanks(noise=noise, ir=ir, noise_valid=noise_valid,
                            ir_valid=ir_valid,
                            ir_spec_re=spec_re, ir_spec_im=spec_im)


_LANE = 128     # v5e lane width; offsets are quantized to it (below)


def _sample_noise(
    banks: AugmentBanks, key: jax.Array, batch: int, t: int
) -> jnp.ndarray:
    """Draw (batch, t) noise snippets: random clip row + random offset.

    Offsets are quantized to _LANE samples (8 ms at 16 kHz - immaterial
    for a random noise bed) so the snippet extraction is a LANE-ALIGNED
    block gather: the obvious per-element (B, T) gather pads each
    gathered element to the 128-lane tile and measured 43.7 ms for
    B=256 on v5e (scripts/profile_augment.py) - most of the entire
    augment budget; the block gather reads the same bytes wide.
    """
    k_row, k_off = jax.random.split(key)
    n_rows, row_len = banks.noise.shape
    assert row_len % _LANE == 0  # from_arrays pads the bank
    nblk = -(-t // _LANE)
    rows = jax.random.randint(k_row, (batch,), 0, n_rows)
    max_off = jnp.maximum(banks.noise_valid[rows] - nblk * _LANE, 1)
    offs = jax.random.randint(k_off, (batch,), 0, 2 ** 30) % max_off
    blk0 = rows * (row_len // _LANE) + offs // _LANE
    idx = blk0[:, None] + jnp.arange(nblk)[None, :]          # (B, nblk)
    bank_blocks = banks.noise.reshape(-1, _LANE)
    out = bank_blocks[idx].reshape(batch, nblk * _LANE)
    return out[:, :t]


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
        if banks.ir_spec_re is not None:
            # MXU path: gather precomputed partition spectra per example
            convolved = apply_ir_os(
                y, banks.ir_spec_re[rows], banks.ir_spec_im[rows]
            )
        else:
            convolved = apply_ir(y, banks.ir[rows])
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
