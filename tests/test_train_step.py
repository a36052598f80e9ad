"""Train-step integration tests on a tiny model, incl. the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grafp_tpu.core.config import Config
from grafp_tpu.core.mesh import data_sharding, make_mesh, replicated_sharding
from grafp_tpu.dsp.augment import AugmentBanks
from grafp_tpu.models import build_model
from grafp_tpu.train import create_train_state, make_train_step
from grafp_tpu.train.step import make_wave_embed_fn


def tiny_config(**kw):
    """Tiny geometry: 1 s @ 1 kHz, n_fft 256 hop 128 -> 8 frames, 16 mels,
    N = 16*8/2 = 64 nodes."""
    return Config(
        fs=1000, win_len=256, hop_len=128, n_fft=256, n_mels=16, n_frames=8,
        bsz_train=8, **kw,
    )


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.key(0), steps_per_epoch=2)
    return cfg, model, state


def test_train_step_reduces_loss(setup, rng):
    cfg, model, state = setup
    banks = AugmentBanks.from_arrays(
        noise_clips=[rng.randn(2000).astype(np.float32)], noise_len=2000
    )
    step = make_train_step(model, cfg, banks, donate=False)
    x_i = jnp.asarray(rng.randn(8, 1000).astype(np.float32))
    x_j = x_i + 0.01 * jnp.asarray(rng.randn(8, 1000).astype(np.float32))
    losses = []
    for i in range(4):
        state, metrics = step(state, x_i, x_j, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # memorizes a fixed batch
    assert int(state.step) == 4


@pytest.mark.slow
def test_train_step_sharded_matches_single_device(rng):
    """The global-batch program must give identical losses regardless of
    how the batch is laid out across the mesh (GSPMD semantics).

    Marked slow (~4 min: compiles the full fwd+bwd step twice on 1 CPU
    core); `pytest -m "not slow"` is the fast lane, the full suite stays
    the CI contract."""
    cfg = tiny_config()
    model = build_model(cfg)
    x_i = jnp.asarray(rng.randn(8, 1000).astype(np.float32))
    x_j = jnp.asarray(rng.randn(8, 1000).astype(np.float32))

    def run(shard: bool):
        state = create_train_state(model, cfg, jax.random.key(0))
        step = make_train_step(model, cfg, banks=None, donate=False)
        if shard:
            mesh = make_mesh()
            xi = jax.device_put(x_i, data_sharding(mesh, 2))
            xj = jax.device_put(x_j, data_sharding(mesh, 2))
            state = jax.device_put(state, replicated_sharding(mesh))
        else:
            xi, xj = x_i, x_j
        state, m = step(state, xi, xj, jax.random.key(0))
        return float(m["loss"]), float(m["grad_norm"])

    # Loss and gradients must agree up to f32 reduction-order noise.
    # (The post-Adam trajectory is NOT comparable: the first Adam update
    # is ~lr*sign(g) elementwise, so 1e-6 gradient noise flips update
    # signs wherever g ~ 0 - an optimizer property, not a sharding bug.)
    loss_s, gn_s = run(False)
    loss_m, gn_m = run(True)
    np.testing.assert_allclose(loss_s, loss_m, rtol=1e-5)
    np.testing.assert_allclose(gn_s, gn_m, rtol=1e-2)


def test_wave_embed_fn(setup, rng):
    cfg, model, state = setup
    embed = make_wave_embed_fn(model, cfg)
    z = embed(state.params, state.batch_stats, jnp.asarray(rng.randn(4, 1000), jnp.float32))
    assert z.shape == (4, 128)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(z), axis=1), 1.0, atol=1e-5)
