import jax.numpy as jnp
import numpy as np

from grafp_tpu.train.loss import ntxent_loss
from grafp_tpu.train.state import cosine_epoch_schedule


def _reference_ntxent(z_i, z_j, tau):
    """Direct numpy transcription of the reference algorithm
    (simclr/ntxent.py:17-29): interleave, full sim matrix, per-row
    remove-self log-softmax, positive at i (even) / i-1 (odd)."""
    z = np.stack([z_i, z_j], axis=1).reshape(2 * len(z_i), -1)
    a = z @ z.T / tau
    ls = []
    for i in range(len(z)):
        row = np.concatenate([a[i, :i], a[i, i + 1:]])
        logsoft = row - np.log(np.exp(row - row.max()).sum()) - row.max()
        ls.append(logsoft[i if i % 2 == 0 else i - 1])
    return -np.sum(ls) / len(z)


def test_ntxent_matches_reference_loop(rng):
    for b in (2, 8, 16):
        z_i = rng.randn(b, 32).astype(np.float64)
        z_i /= np.linalg.norm(z_i, axis=1, keepdims=True)
        z_j = rng.randn(b, 32).astype(np.float64)
        z_j /= np.linalg.norm(z_j, axis=1, keepdims=True)
        ref = _reference_ntxent(z_i, z_j, 0.05)
        got = float(
            ntxent_loss(jnp.asarray(z_i, jnp.float32), jnp.asarray(z_j, jnp.float32), 0.05)
        )
        np.testing.assert_allclose(got, ref, rtol=2e-4)


def test_ntxent_perfect_alignment_low_loss(rng):
    z = rng.randn(16, 32)
    z /= np.linalg.norm(z, axis=1, keepdims=True)
    aligned = float(ntxent_loss(jnp.asarray(z), jnp.asarray(z), 0.05))
    shuffled = float(
        ntxent_loss(jnp.asarray(z), jnp.asarray(np.roll(z, 1, axis=0)), 0.05)
    )
    assert aligned < 1e-3
    assert shuffled > aligned + 1.0


def test_cosine_epoch_schedule_torch_parity():
    """Closed form vs torch CosineAnnealingLR values."""
    lr0, min_lr, t_max, spe = 8e-5, 7e-7, 400, 10
    sched = cosine_epoch_schedule(lr0, min_lr, t_max, spe)
    np.testing.assert_allclose(float(sched(0)), lr0, rtol=1e-6)  # f32 rounding
    # epoch 200 (halfway): (lr0+min)/2
    np.testing.assert_allclose(float(sched(200 * spe)), (lr0 + min_lr) / 2, rtol=1e-6)
    np.testing.assert_allclose(float(sched(400 * spe)), min_lr, rtol=1e-6)
    # within an epoch the lr is constant (torch steps per epoch)
    assert float(sched(5)) == float(sched(9))
