"""The compiled training step: one jitted global-batch program.

Fuses the whole per-step pipeline on device (the reference splits it
across dataloader workers + a no_grad GPU augment + DataParallel forward,
train.py:56-82):

    raw waves (x_i, x_j) -> [device] augment x_j (IR + SNR noise)
      -> log-mel both views -> stacked 2B forward through
      PeakEmbed/GraphEncoder/projector -> NT-Xent -> adam update.

Under a Mesh the batch arrives sharded on the 'data' axis and params
replicated; XLA/GSPMD inserts the psum for gradients and the all-gather
implied by the (2B, 2B) NT-Xent matmul. No pmap, no manual collectives.

Deviation from the reference, by design: both views go through the
encoder as ONE stacked 2B batch, so BatchNorm statistics are computed
jointly over (x_i, x_j) rather than per-view (the reference runs two
sequential forwards, simclr.py:29-45). Symmetric and mesh-size-invariant.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from grafp_tpu.dsp.augment import AugmentBanks, augment_waveforms
from grafp_tpu.dsp.melspec import LogMelConfig, log_mel_spectrogram
from grafp_tpu.train.loss import ntxent_loss
from grafp_tpu.train.state import TrainState


def make_train_step(
    model,
    cfg,
    banks: Optional[AugmentBanks] = None,
    augment_on_device: bool = True,
    donate: bool = True,
) -> Callable:
    """Build the jitted train step.

    step(state, x_i, x_j, key) -> (state, metrics)
      x_i, x_j: (B, T) float32 raw waveforms (x_j pre- or un-corrupted).
    """
    mcfg = LogMelConfig.from_config(cfg)
    tau = float(cfg["tau"])
    snr = tuple(float(s) for s in cfg["tr_snr"])
    ir_p = float(cfg["ir_prob"])
    noise_p = float(cfg["noise_prob"])

    def step(state: TrainState, x_i, x_j, key):
        if augment_on_device and banks is not None and (
            banks.noise is not None or banks.ir is not None
        ):
            k_aug, key = jax.random.split(key)
            x_j = augment_waveforms(x_j, banks, k_aug, snr, ir_p, noise_p)
        spec = log_mel_spectrogram(jnp.concatenate([x_i, x_j], axis=0), mcfg)

        def loss_fn(params):
            (h, z), updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                spec,
                True,
                mutable=["batch_stats"],
                rngs={"droppath": key},
            )
            b = x_i.shape[0]
            loss = ntxent_loss(z[:b], z[b:], tau)
            return loss, updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads, new_stats)
        gnorm = optax_global_norm(grads)
        return new_state, {"loss": loss, "grad_norm": gnorm}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


def make_embed_fn(model, cfg) -> Callable:
    """Jitted eval-mode embed: (B, n_mels, n_frames) spectrogram segments
    -> (B, d) L2-normalized fingerprints (running BN stats)."""

    @jax.jit
    def embed(params, batch_stats, spec):
        h, z = model.apply(
            {"params": params, "batch_stats": batch_stats}, spec, False
        )
        return z

    return embed


def make_wave_embed_fn(model, cfg) -> Callable:
    """Jitted raw-audio fingerprint: (B, T) waves -> (B, d)."""
    mcfg = LogMelConfig.from_config(cfg)

    @jax.jit
    def embed(params, batch_stats, waves):
        spec = log_mel_spectrogram(waves, mcfg)
        h, z = model.apply(
            {"params": params, "batch_stats": batch_stats}, spec, False
        )
        return z

    return embed
