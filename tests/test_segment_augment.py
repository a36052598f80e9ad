import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grafp_tpu.dsp.augment import (
    AugmentBanks,
    apply_ir,
    augment_waveforms,
    mix_noise_at_snr,
)
from grafp_tpu.dsp.segment import num_segments, unfold_segments


# ---------------- segmenting ----------------

def test_num_segments_matches_unfold_semantics():
    # torch unfold: floor((total - size)/step) + 1
    assert num_segments(32, 32, 3) == 1
    assert num_segments(35, 32, 3) == 2
    assert num_segments(31, 32, 3) == 0
    assert num_segments(929, 32, 3) == 300  # ~30s track @ hop 512


def test_unfold_segments_values(rng):
    spec = jnp.asarray(rng.randn(64, 50).astype(np.float32))
    segs = unfold_segments(spec, 32, 3)
    assert segs.shape == (7, 64, 32)
    for s in range(7):
        np.testing.assert_array_equal(
            np.asarray(segs[s]), np.asarray(spec[:, s * 3:s * 3 + 32])
        )


# ---------------- augmentation ----------------

def test_apply_ir_delta_is_identity(rng):
    x = jnp.asarray(rng.randn(2, 1000).astype(np.float32))
    ir = jnp.zeros((2, 64)).at[:, 0].set(1.0)
    y = apply_ir(x, ir)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)


def test_apply_ir_matches_numpy_full_conv(rng):
    x = rng.randn(600).astype(np.float32)
    h = rng.randn(100).astype(np.float32)
    y = apply_ir(jnp.asarray(x), jnp.asarray(h))
    ref = np.convolve(x, h, mode="full")[:600]
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-3, atol=1e-3)


def test_mix_noise_achieves_requested_snr(rng):
    x = jnp.asarray(rng.randn(4, 8000).astype(np.float32))
    noise = jnp.asarray(rng.randn(4, 8000).astype(np.float32))
    snr = jnp.asarray([0.0, 10.0, 20.0, 6.0])
    y = mix_noise_at_snr(x, noise, snr)
    added = np.asarray(y) - np.asarray(x)
    got_snr = 20 * np.log10(
        np.sqrt(np.mean(np.asarray(x) ** 2, -1))
        / np.sqrt(np.mean(added ** 2, -1))
    )
    np.testing.assert_allclose(got_snr, np.asarray(snr), atol=0.05)


def test_mix_noise_silent_noise_passthrough():
    x = jnp.ones((1, 100))
    y = mix_noise_at_snr(x, jnp.zeros((1, 100)), jnp.asarray([10.0]))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))


def test_banks_packing_loops_and_pads():
    banks = AugmentBanks.from_arrays(
        noise_clips=[np.ones(10, np.float32), np.arange(50, dtype=np.float32)],
        ir_clips=[np.ones(5, np.float32)],
        noise_len=40,
        ir_len=8,
    )
    # noise rows are sized up to the 128-sample lane multiple (the
    # sampler block-gathers at that granularity) and the loop-fill
    # covers the whole lane-padded row
    assert banks.noise.shape == (2, 128)
    np.testing.assert_array_equal(np.asarray(banks.noise[0]), np.ones(128))
    assert int(banks.noise_valid[0]) == 128
    assert banks.ir.shape == (1, 8)
    np.testing.assert_array_equal(np.asarray(banks.ir[0, 5:]), np.zeros(3))  # padded


def test_augment_waveforms_end_to_end(rng):
    x = jnp.asarray(rng.randn(4, 2000).astype(np.float32))
    banks = AugmentBanks.from_arrays(
        noise_clips=[rng.randn(4000).astype(np.float32) for _ in range(3)],
        ir_clips=[np.concatenate([[1.0], rng.randn(63) * 0.1]).astype(np.float32)],
        noise_len=4000,
        ir_len=64,
    )
    key = jax.random.key(0)
    y = jax.jit(
        lambda x, k: augment_waveforms(x, banks, k, (0.0, 20.0), 1.0, 1.0)
    )(x, key)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    assert not np.allclose(np.asarray(y), np.asarray(x))  # actually corrupted
    # prob=0 -> passthrough
    y0 = augment_waveforms(x, banks, key, (0.0, 20.0), 0.0, 0.0)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(x))


def test_apply_ir_os_matches_convolve(rng):
    """The MXU-native partitioned overlap-add GEMM convolution (the
    production IR path; jnp.fft measured 46.9 ms/step on TPU) must equal
    np.convolve and the FFT reference to f32 rounding, including IRs
    longer than the audio and non-multiple-of-hop lengths."""
    import jax.numpy as jnp

    from grafp_tpu.dsp.augment import (
        apply_ir, apply_ir_os, partitioned_ir_spectra,
    )

    for (b, t, l) in ((2, 4000, 9000), (2, 2500, 300), (1, 1024, 1)):
        x = rng.randn(b, t).astype(np.float32)
        irs = rng.randn(b, l).astype(np.float32) * 0.1
        re, im = partitioned_ir_spectra(irs)
        got = np.asarray(apply_ir_os(jnp.asarray(x), re, im))
        want = np.stack([np.convolve(x[i], irs[i])[:t] for i in range(b)])
        scale = np.abs(want).max()
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-5 * scale)
        fft = np.asarray(apply_ir(jnp.asarray(x), jnp.asarray(irs)))
        np.testing.assert_allclose(got, fft, rtol=0, atol=2e-5 * scale)


def test_augment_waveforms_gemm_matches_fft_path(rng):
    """augment_waveforms with precomputed spectra (production) equals the
    FFT fallback on the same banks and key."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from grafp_tpu.dsp.augment import AugmentBanks, augment_waveforms

    banks = AugmentBanks.from_arrays(
        noise_clips=[rng.randn(5000).astype(np.float32) for _ in range(3)],
        ir_clips=[np.r_[1.0, rng.randn(2047) * 0.1].astype(np.float32)
                  for _ in range(2)],
        noise_len=5000, ir_len=2048,
    )
    assert banks.ir_spec_re is not None      # built automatically
    no_spec = dataclasses.replace(banks, ir_spec_re=None, ir_spec_im=None)
    x = jnp.asarray(rng.randn(4, 3000).astype(np.float32))
    key = jax.random.key(3)
    y_gemm = np.asarray(augment_waveforms(x, banks, key, (0.0, 10.0)))
    y_fft = np.asarray(augment_waveforms(x, no_spec, key, (0.0, 10.0)))
    np.testing.assert_allclose(y_gemm, y_fft, rtol=0,
                               atol=2e-5 * np.abs(y_fft).max())
