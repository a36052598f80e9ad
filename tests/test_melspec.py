import jax.numpy as jnp
import numpy as np
import pytest

from grafp_tpu.dsp.melspec import (
    LogMelConfig,
    _hann_window,
    amplitude_to_db,
    log_mel_spectrogram,
    mel_filterbank,
    power_spectrogram,
)

CFG = LogMelConfig()  # grafp defaults: 16k, n_fft=1024, hop=512, 64 mels


def _np_power_spec(x, n_fft, hop, win):
    """Independent numpy STFT: reflect center pad + hann + rfft + |.|^2."""
    pad = n_fft // 2
    xp = np.pad(x, (pad, pad), mode="reflect")
    n_frames = 1 + (len(xp) - n_fft) // hop
    out = np.zeros((n_fft // 2 + 1, n_frames))
    for t in range(n_frames):
        fr = xp[t * hop:t * hop + n_fft] * win
        out[:, t] = np.abs(np.fft.rfft(fr)) ** 2
    return out


def test_frame_count_one_second():
    x = jnp.zeros(16000)
    p = power_spectrogram(x, CFG)
    assert p.shape == (513, 32)  # reference yields (64,32) post-mel
    assert CFG.num_frames(16000) == 32


def test_matmul_equals_fft_path(rng):
    x = jnp.asarray(rng.randn(2, 16000).astype(np.float32))
    a = power_spectrogram(x, LogMelConfig(method="matmul"))
    b = power_spectrogram(x, LogMelConfig(method="fft"))
    assert a.shape == b.shape == (2, 513, 32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-2)


def test_power_spec_matches_numpy_reference(rng):
    x = rng.randn(16000).astype(np.float32) * 0.1
    win = _hann_window(1024, 1024)
    ref = _np_power_spec(np.asarray(x, np.float64), 1024, 512, win)
    got = np.asarray(power_spectrogram(jnp.asarray(x), CFG))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_mel_filterbank_properties():
    fb = mel_filterbank(513, 64, 16000)
    assert fb.shape == (513, 64)
    assert fb.min() >= 0
    # every filter has mass; triangles overlap so interior bins covered
    assert (fb.sum(axis=0) > 0).all()
    # HTK mel anchor: mel(700 Hz) = 2595*log10(2)
    from grafp_tpu.dsp.melspec import _hz_to_mel_htk

    np.testing.assert_allclose(_hz_to_mel_htk(np.array(700.0)), 2595 * np.log10(2))


def test_amplitude_to_db_semantics():
    p = jnp.asarray([[1.0, 0.0, 1e-12, 100.0]])
    db = amplitude_to_db(p, CFG)
    np.testing.assert_allclose(
        np.asarray(db), [[0.0, -100.0, -100.0, 20.0]], atol=1e-5
    )  # clamped at amin=1e-10 -> -100 dB


def test_logmel_shape_and_dtype(rng):
    x = jnp.asarray(rng.randn(3, 16000).astype(np.float32))
    m = log_mel_spectrogram(x, CFG)
    assert m.shape == (3, 64, 32)
    assert m.dtype == jnp.float32
    assert np.isfinite(np.asarray(m)).all()


def test_sine_lands_in_correct_mel_bin():
    # 1 kHz tone should put its energy near the filter whose center is 1 kHz
    t = np.arange(16000) / 16000
    x = jnp.asarray(np.sin(2 * np.pi * 1000 * t).astype(np.float32))
    m = np.asarray(log_mel_spectrogram(x, CFG))
    peak_mel = m.mean(axis=1).argmax()
    # find which mel filter has center closest to 1 kHz
    from grafp_tpu.dsp.melspec import _hz_to_mel_htk, _mel_to_hz_htk

    m_pts = np.linspace(_hz_to_mel_htk(0.0), _hz_to_mel_htk(8000.0), 66)
    centers = _mel_to_hz_htk(m_pts)[1:-1]
    expect = np.abs(centers - 1000).argmin()
    assert abs(int(peak_mel) - int(expect)) <= 1
