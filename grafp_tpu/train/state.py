"""Train state and optimization schedule.

Optimizer parity with the reference (train.py:174-175): Adam(lr=8e-5,
torch defaults b1=0.9 b2=0.999 eps=1e-8) + CosineAnnealingLR stepped
once per EPOCH with T_max=400 and eta_min=7e-7:
    lr(e) = eta_min + (lr0 - eta_min) * (1 + cos(pi * e / T_max)) / 2
(torch's recursive formula reduces to this closed form when stepping
monotonically without restarts).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Any = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt,
        )


def cosine_epoch_schedule(
    lr: float, min_lr: float, t_max: int, steps_per_epoch: int
):
    """Per-step schedule implementing torch CosineAnnealingLR stepped per
    epoch (reference train.py:175,232). Epochs past T_max hold... the
    torch recursion actually continues oscillating past T_max; training
    runs exactly T_max epochs in the reference so we clamp the phase."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        phase = jnp.minimum(epoch, t_max) / t_max
        return min_lr + (lr - min_lr) * 0.5 * (1.0 + jnp.cos(jnp.pi * phase))

    return schedule


def make_optimizer(cfg, steps_per_epoch: int) -> optax.GradientTransformation:
    sched = cosine_epoch_schedule(
        cfg["lr"], cfg["min_lr"], cfg["T_max"], steps_per_epoch
    )
    return optax.adam(sched, b1=0.9, b2=0.999, eps=1e-8)


def create_train_state(
    model, cfg, rng: jax.Array, steps_per_epoch: int = 1
) -> TrainState:
    """Initialize params/batch_stats with a dummy spectrogram batch."""
    if str(cfg["serve_quant"] or "none").lower() != "none":
        # int8-dynamic matmuls round() activations - zero gradient
        # almost everywhere, so training would silently not learn
        raise ValueError(
            "serve_quant is extraction-only; unset it for training "
            "(the int8 round() has zero gradient)")
    dummy = jnp.zeros((2, cfg["n_mels"], cfg["n_frames"]), jnp.float32)
    variables = model.init({"params": rng}, dummy, False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tx = make_optimizer(cfg, steps_per_epoch)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )
