"""Spectrogram -> node-embedding frontend ("peak extractor").

Counterpart of the reference's GPUPeakExtractorv2 (peak_extractor.py:11-82)
- despite the name it is not a peak picker: per-example min-max
normalization of the log-mel, two linspace coordinate channels, a single
strided conv, reshape to graph nodes.

Input (B, n_mels, n_frames) channels-first spectrogram (the DSP frontend's
natural output), internally channels-last for TPU conv layout. Channel
order [T, F, S] matches the reference's cat((T_tensor, F_tensor, peaks))
(peak_extractor.py:69) for checkpoint-import parity. Output (B, N, C)
nodes with N = n_mels*n_frames/stride (1024 for the grafp config),
node index = mel_row*W + frame_col, matching the reference's
(B, C, H, W) -> (B, C, H*W) reshape (peak_extractor.py:80-82).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from grafp_tpu.models.layers import kaiming_normal_fan_out_init


class PeakEmbed(nn.Module):
    n_filters: int = 8
    kernel: Tuple[int, int] = (7, 7)
    stride: int = 2          # applied along the mel axis only
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, spec: jnp.ndarray) -> jnp.ndarray:
        # spec: (B, n_mels, n_frames)
        b, h, w = spec.shape
        mn = jnp.min(spec, axis=(1, 2), keepdims=True)
        mx = jnp.max(spec, axis=(1, 2), keepdims=True)
        # The reference divides by (max-min) unguarded and NaNs on constant
        # (silent) segments (peak_extractor.py:58-60), relying on a NaN->0
        # scrub at retrieval time (reference eval.py:165). Guarding here
        # keeps silent segments finite with no effect on normal audio
        # (log-mel dynamic range is tens of dB).
        s = (spec - mn) / jnp.maximum(mx - mn, 1e-8)       # (B, H, W)

        t_coord = jnp.linspace(0.0, 1.0, w)[None, None, :]  # time in [0,1]
        f_coord = jnp.linspace(0.0, 1.0, h)[None, :, None]  # freq in [0,1]
        t_full = jnp.broadcast_to(t_coord, (b, h, w))
        f_full = jnp.broadcast_to(f_coord, (b, h, w))
        x = jnp.stack([t_full, f_full, s], axis=-1)         # (B, H, W, 3)

        kh, kw = self.kernel
        y = nn.Conv(
            self.n_filters,
            kernel_size=(kh, kw),
            strides=(self.stride, 1),
            padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
            kernel_init=kaiming_normal_fan_out_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="conv",
        )(x)
        y = nn.relu(y)                                      # (B, H/stride, W, C)
        return y.reshape(b, -1, self.n_filters)             # (B, N, C)
