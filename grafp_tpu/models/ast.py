"""AST baseline encoder: ViT over spectrogram patches.

Counterpart of the reference's ASTEncoder (encoder/ast_encoder.py:278-415
with PatchEmbed/Attention/MLP/Block at :5-275): (64, 100) log-mel ->
(64, 10)-patch conv embedding -> 640-d tokens, cls token + learned
positional embedding, 8 pre-norm transformer blocks (10 heads, qkv bias,
GELU MLP x4, LayerNorm eps 1e-6), final LN, cls head Linear(640->1024).

Attention uses jax.nn.dot_product_attention (fused flash path on TPU).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from grafp_tpu.models.layers import torch_bias_init, torch_default_init


class ViTBlock(nn.Module):
    dim: int
    n_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        d, h = self.dim, self.n_heads
        hd = d // h
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        qkv = nn.Dense(3 * d, use_bias=self.qkv_bias,
                       kernel_init=torch_default_init,
                       bias_init=torch_bias_init(d),
                       dtype=self.dtype, name="qkv")(y)
        b, t, _ = qkv.shape
        q, k, v = jnp.split(qkv.reshape(b, t, 3, h, hd), 3, axis=2)
        attn = jax.nn.dot_product_attention(
            q[:, :, 0], k[:, :, 0], v[:, :, 0]
        ).reshape(b, t, d)
        attn = nn.Dense(d, kernel_init=torch_default_init,
                        bias_init=torch_bias_init(d),
                        dtype=self.dtype, name="proj")(attn)
        x = x + attn
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        hidden = int(d * self.mlp_ratio)
        y = nn.Dense(hidden, kernel_init=torch_default_init,
                     bias_init=torch_bias_init(d),
                     dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(d, kernel_init=torch_default_init,
                     bias_init=torch_bias_init(hidden),
                     dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class ASTEncoder(nn.Module):
    img_size: Tuple[int, int] = (64, 100)
    patch_size: Tuple[int, int] = (64, 10)
    embed_dim: int = 640
    depth: int = 8
    n_heads: int = 10
    n_classes: int = 1024      # output embedding dim (h)
    mlp_ratio: float = 4.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, n_mels, n_frames) spectrogram
        b, hgt, wid = x.shape
        ph, pw = self.patch_size
        assert hgt == self.img_size[0] and wid == self.img_size[1], (
            f"Input feature size ({hgt}*{wid}) doesn't match model "
            f"({self.img_size[0]}*{self.img_size[1]})."
        )
        n_patches = (hgt // ph) * (wid // pw)
        # patchify: conv with kernel=stride=patch (reference PatchEmbed)
        y = nn.Conv(self.embed_dim, kernel_size=(ph, pw), strides=(ph, pw),
                    padding="VALID", kernel_init=torch_default_init,
                    bias_init=torch_bias_init(ph * pw),
                    dtype=self.dtype, name="patch")(x[..., None])
        tokens = y.reshape(b, n_patches, self.embed_dim)

        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.embed_dim), jnp.float32)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, 1 + n_patches, self.embed_dim), jnp.float32)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.embed_dim)), tokens], axis=1
        ) + pos

        for i in range(self.depth):
            tokens = ViTBlock(self.embed_dim, self.n_heads, self.mlp_ratio,
                              dtype=self.dtype, name=f"block{i}")(tokens)
        tokens = nn.LayerNorm(epsilon=1e-6, name="norm")(tokens)
        return nn.Dense(self.n_classes, kernel_init=torch_default_init,
                        bias_init=torch_bias_init(self.embed_dim),
                        dtype=self.dtype, name="head")(tokens[:, 0])
