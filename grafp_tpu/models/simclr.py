"""SimCLR wrapper: frontend + encoder + projector -> L2-normalized z.

Counterpart of the reference's simclr/simclr.py:7-48. The 128-d z IS the
fingerprint (reference test_fp.py:95-98). Projector: Linear(h -> d*u) ->
ELU -> Linear(d*u -> d), then F.normalize (simclr.py:24-45).

Unlike the reference (which runs the encoder twice per step, once per
view), callers here pass any (B, ...) batch; the train step stacks the
two views into one batch so both forwards share one compiled program and
BatchNorm sees the same per-step statistics for both views.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from grafp_tpu.models.gnn import GraphEncoder
from grafp_tpu.models.layers import torch_bias_init, torch_default_init
from grafp_tpu.models.peak_embed import PeakEmbed
from grafp_tpu.ops.knn import l2_normalize


class Projector(nn.Module):
    d: int = 128
    u: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, h: jnp.ndarray) -> jnp.ndarray:
        hid = self.d * self.u
        z = nn.Dense(
            hid, kernel_init=torch_default_init,
            bias_init=torch_bias_init(h.shape[-1]), dtype=self.dtype, name="fc1",
        )(h)
        z = nn.elu(z)
        z = nn.Dense(
            self.d, kernel_init=torch_default_init,
            bias_init=torch_bias_init(hid), dtype=self.dtype, name="fc2",
        )(z)
        return z


class SimCLRModel(nn.Module):
    """arch='grafp': spectrogram (B, n_mels, n_frames) -> PeakEmbed ->
    GraphEncoder -> projector. Other archs (ast/nafp) consume the
    spectrogram directly (reference simclr.py:19-22,31-32)."""

    arch: str = "grafp"
    encoder: nn.Module = None
    n_filters: int = 8
    blur_kernel: tuple = (7, 7)
    peak_stride: int = 2
    d: int = 128
    u: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        """Returns (h, z): encoder embedding and L2-normalized fingerprint."""
        if self.arch == "grafp":
            x = PeakEmbed(
                n_filters=self.n_filters, kernel=tuple(self.blur_kernel),
                stride=self.peak_stride, dtype=self.dtype, name="peak",
            )(x)
        h = self.encoder(x, train=train)
        z = Projector(d=self.d, u=self.u, dtype=self.dtype, name="projector")(h)
        z = l2_normalize(z, axis=-1)
        return h, z


def build_model(cfg, axis_name: Optional[str] = None) -> SimCLRModel:
    """Construct the flagship model from a Config (reference train.py:164:
    SimCLR(cfg, encoder=GraphEncoder(cfg, in_channels=n_filters, k=k)))."""
    dtype = jnp.dtype(cfg["compute_dtype"]) if cfg["compute_dtype"] else None
    quant = str(cfg["serve_quant"] or "none").lower()
    if quant not in ("none", "int8"):
        raise ValueError(f"serve_quant must be 'none' or 'int8', got {quant!r}")
    if cfg["arch"] == "grafp":
        encoder = GraphEncoder(
            size=cfg["size"],
            k=int(cfg["k"]),
            emb_dims=cfg["h"],
            dilation_schedule=cfg["dilation_schedule"],
            drop_path=cfg["drop_path"],
            drop_path_schedule=cfg["drop_path_schedule"],
            knn_block_rows=int(cfg["knn_block_size"]),
            knn_strategy=cfg["knn_strategy"],
            remat=bool(cfg["remat"]),
            axis_name=axis_name if cfg["bn_cross_replica"] else None,
            dtype=dtype,
            # the projector stays full-precision: quantization noise in
            # the LAST linear feeds the fingerprint directly, and the
            # backbone is where the FLOPs are (93%)
            quant=quant == "int8",
        )
    elif cfg["arch"] == "ast":
        from grafp_tpu.models.ast import ASTEncoder

        if quant == "int8":
            raise NotImplementedError("serve_quant='int8' supports arch=grafp only")
        encoder = ASTEncoder(dtype=dtype)
    elif cfg["arch"] == "nafp":
        from grafp_tpu.models.nafp import NAFPEncoder

        if quant == "int8":
            raise NotImplementedError("serve_quant='int8' supports arch=grafp only")
        encoder = NAFPEncoder(dtype=dtype)
    else:
        raise NotImplementedError(f"arch {cfg['arch']}")
    return SimCLRModel(
        arch=cfg["arch"],
        encoder=encoder,
        n_filters=cfg["n_filters"],
        blur_kernel=tuple(cfg["blur_kernel"]),
        peak_stride=cfg["peak_stride"],
        d=cfg["d"],
        u=cfg["u"],
        dtype=dtype,
    )
