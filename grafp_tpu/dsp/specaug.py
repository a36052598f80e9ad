"""SpecAugment time/frequency masking.

The reference wires torchaudio TimeMasking(time_mask, iid_masks=True) +
FrequencyMasking(freq_mask, True) but comments them out of the grafp
path (transformations.py:59-62,79-85); the config keys (time_mask=8,
freq_mask=16) remain. Provided here as jit-able ops with torchaudio
semantics: per-example iid masks, width ~ U[0, param), start uniform in
the valid range, masked region set to 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _mask_axis(spec: jnp.ndarray, key: jax.Array, param: int,
               axis: int) -> jnp.ndarray:
    """Mask a random span along `axis` (1=freq, 2=time) of (B, F, T)."""
    b = spec.shape[0]
    size = spec.shape[axis]
    k1, k2 = jax.random.split(key)
    width = jax.random.uniform(k1, (b,)) * param            # [0, param)
    start = jax.random.uniform(k2, (b,)) * (size - width)
    pos = jnp.arange(size)[None, :]
    mask = (pos >= start[:, None]) & (pos < (start + width)[:, None])
    shape = [b, 1, 1]
    shape[axis] = size
    return jnp.where(mask.reshape(shape), 0.0, spec)


def spec_augment(
    spec: jnp.ndarray,
    key: jax.Array,
    time_mask: int = 8,
    freq_mask: int = 16,
) -> jnp.ndarray:
    """(B, n_mels, n_frames) -> masked copy (one time + one freq mask
    per example, iid)."""
    k_t, k_f = jax.random.split(key)
    out = _mask_axis(spec, k_t, time_mask, axis=2)
    out = _mask_axis(out, k_f, freq_mask, axis=1)
    return out
