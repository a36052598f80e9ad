"""The fused per-track fingerprint path must equal the staged
segments_for + embed path exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grafp_tpu.core.config import Config
from grafp_tpu.fp.builder import FingerprintPipeline
from grafp_tpu.models import build_model


@pytest.fixture(scope="module")
def pipe():
    cfg = Config(fs=1000, win_len=256, hop_len=128, n_fft=256, n_mels=16,
                 n_frames=8, overlap=0.5, val_snr=[10, 10])
    model = build_model(cfg)
    v = model.init({"params": jax.random.key(0)}, jnp.zeros((1, 16, 8)), False)
    return FingerprintPipeline(model, cfg, v["params"], v["batch_stats"],
                               batch_size=16, bucket_s=2.0)


def test_fused_equals_staged(pipe, rng):
    for t in (1000, 1503, 3000, 4096):
        wave = rng.randn(t).astype(np.float32) * 0.2
        segs = pipe.segments_for(wave)
        if len(segs) == 0:
            assert pipe.fingerprint_track(wave).shape == (0, 128)
            continue
        staged = []
        for j in range(0, len(segs), 16):
            blk = segs[j:j + 16]
            pad = 16 - len(blk)
            blk = np.pad(blk, ((0, pad), (0, 0), (0, 0))) if pad else blk
            z = np.asarray(pipe._embed(jnp.asarray(blk)))
            staged.append(z[:16 - pad] if pad else z)
        staged = np.concatenate(staged)
        fused = pipe.fingerprint_track(wave)
        assert fused.shape == staged.shape
        np.testing.assert_allclose(fused, staged, rtol=1e-4, atol=1e-5)


def test_fused_short_track(pipe, rng):
    z = pipe.fingerprint_track(rng.randn(500).astype(np.float32))
    # 500 samples -> 4 frames < n_frames=8 -> no segments
    assert z.shape == (0, 128)
