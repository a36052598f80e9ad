"""NAFP baseline encoder: separable conv stack with full-shape LayerNorm.

Counterpart of the reference's NAFPEncoder (encoder/neural_audio_fp.py:
12-46): 8 channel stages [128,128,256,256,512,512,1024,1024]; each stage
is a (1,3)/stride-(1,2) conv + LayerNorm over the full (C,H,W) feature
map + ReLU, then a (3,1)/stride-(2,1) conv + LN + ReLU. Input spectrogram
(B, 256, 32) -> (B, 1024) embedding (spatial dims collapse to 1x1).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from grafp_tpu.models.layers import torch_bias_init, torch_default_init

CHANNELS = (128, 128, 256, 256, 512, 512, 1024, 1024)  # chang_fp


class FullShapeLayerNorm(nn.Module):
    """torch nn.LayerNorm(normalized_shape=[C, H, W]) equivalent for
    channels-last (B, H, W, C): normalize + affine over ALL of (H, W, C)."""

    @nn.compact
    def __call__(self, x):
        shape = x.shape[1:]
        scale = self.param("scale", nn.initializers.ones, shape, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, shape, jnp.float32)
        mu = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        var = jnp.var(x, axis=(1, 2, 3), keepdims=True)
        return (x - mu) / jnp.sqrt(var + 1e-5) * scale + bias


class NAFPEncoder(nn.Module):
    in_height: int = 256
    in_width: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, H=256, W=32) spectrogram -> channels-last (B, H, W, 1)
        y = x[..., None]
        for i, ch in enumerate(CHANNELS):
            y = nn.Conv(ch, kernel_size=(1, 3), strides=(1, 2),
                        padding=((0, 0), (1, 1)),
                        kernel_init=torch_default_init,
                        bias_init=torch_bias_init(3 * max(y.shape[-1], 1)),
                        dtype=self.dtype, name=f"conv{i}a")(y)
            y = FullShapeLayerNorm(name=f"ln{i}a")(y)
            y = nn.relu(y)
            y = nn.Conv(ch, kernel_size=(3, 1), strides=(2, 1),
                        padding=((1, 1), (0, 0)),
                        kernel_init=torch_default_init,
                        bias_init=torch_bias_init(3 * ch),
                        dtype=self.dtype, name=f"conv{i}b")(y)
            y = FullShapeLayerNorm(name=f"ln{i}b")(y)
            y = nn.relu(y)
        return y.reshape(y.shape[0], -1)
