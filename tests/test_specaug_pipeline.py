import jax
import jax.numpy as jnp
import numpy as np

from grafp_tpu.core.config import Config
from grafp_tpu.dsp.augment import AugmentBanks
from grafp_tpu.dsp.pipeline import AudioTransform
from grafp_tpu.dsp.specaug import spec_augment


def test_spec_augment_masks_and_bounds(rng):
    spec = jnp.ones((4, 64, 32))
    out = np.asarray(spec_augment(spec, jax.random.key(0), 8, 16))
    assert out.shape == (4, 64, 32)
    # masked entries are exactly zero, rest untouched
    assert ((out == 0) | (out == 1)).all()
    assert (out == 0).any()
    # per-example masks differ (iid)
    zero_counts = (out == 0).sum(axis=(1, 2))
    assert len(set(zero_counts.tolist())) > 1
    # mask widths bounded: time mask <= 8 columns, freq <= 16 rows
    for b in range(4):
        col_masked = (out[b] == 0).all(axis=0)
        row_masked = (out[b] == 0).all(axis=1)
        assert col_masked.sum() <= 8
        assert row_masked.sum() <= 16


def _cfg():
    return Config(fs=1000, win_len=256, hop_len=128, n_fft=256, n_mels=16,
                  n_frames=8, overlap=0.5, val_snr=[10, 10], dur=1.0)


def _banks(rng):
    return AugmentBanks.from_arrays(
        noise_clips=[rng.randn(3000).astype(np.float32)],
        ir_clips=[np.r_[1.0, np.zeros(15)].astype(np.float32)],
        noise_len=3000, ir_len=16,
    )


def test_audio_transform_train_mode(rng):
    tr = AudioTransform(_cfg(), train=True)
    xi = rng.randn(4, 1000).astype(np.float32)
    Xi, Xj = tr(xi, xi)
    assert Xi.shape == (4, 16, 9) or Xi.shape == (4, 16, 8)


def test_audio_transform_cpu_mode(rng):
    tr = AudioTransform(_cfg(), banks=_banks(rng), cpu=True)
    xi = rng.randn(1000).astype(np.float32)
    xj_in = rng.randn(1000).astype(np.float32)
    xi_out, xj = tr(xi, xj_in)
    assert xj.shape == (1000,)
    assert not np.allclose(np.asarray(xj), xj_in)  # corrupted
    np.testing.assert_array_equal(np.asarray(xi_out), xi)  # x_i untouched


def test_audio_transform_eval_mode(rng):
    cfg = _cfg()
    tr = AudioTransform(cfg, banks=_banks(rng), train=False)
    track = rng.randn(5000).astype(np.float32)
    Xi, Xj = tr(track, track)
    # frames = 1+5000//128 = 40 -> segments (40-8)//4+1 = 9
    assert Xi.shape == (9, 16, 8) and Xj.shape == (9, 16, 8)
    assert not np.allclose(np.asarray(Xi), np.asarray(Xj))  # x_j corrupted
    # dummy-db shortcut
    Xa, Xb = tr(track, None)
    np.testing.assert_array_equal(np.asarray(Xa), np.asarray(Xb))
