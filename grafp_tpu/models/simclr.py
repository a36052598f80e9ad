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
    if quant not in ("none", "int8", "int8_static", "int8_calibrate"):
        raise ValueError(
            "serve_quant must be one of none|int8|int8_static|"
            f"int8_calibrate, got {quant!r}")
    # module-level quant knob: 'int8' = dynamic activation scales;
    # 'int8_static' serves with calibrated per-layer scales (collection
    # 'act_scales', produced by one 'int8_calibrate' pass - see
    # calibrate_act_scales)
    quant_flag = {"none": False, "int8": "dynamic",
                  "int8_static": "static",
                  "int8_calibrate": "calibrate"}[quant]
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
            quant=quant_flag,
        )
    elif cfg["arch"] == "ast":
        from grafp_tpu.models.ast import ASTEncoder

        if quant_flag:
            raise NotImplementedError("serve_quant int8 supports arch=grafp only")
        encoder = ASTEncoder(dtype=dtype)
    elif cfg["arch"] == "nafp":
        from grafp_tpu.models.nafp import NAFPEncoder

        if quant_flag:
            raise NotImplementedError("serve_quant int8 supports arch=grafp only")
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


def calibrate_act_scales(cfg, params, batch_stats, spec_batches):
    """Offline calibration for ``serve_quant='int8_static'``.

    Runs the model with quant mode 'calibrate' (exact dense matmuls, no
    quantization) over ``spec_batches`` (iterable of (B, n_mels,
    n_frames) spectrogram batches), accumulating every quant layer's
    running activation |max| into the 'act_scales' variable collection.
    Returns that collection; pass it alongside params/batch_stats when
    applying the 'int8_static' model (FingerprintPipeline's
    extra_variables). Static scales remove the per-layer dynamic
    activation-max passes that made dynamic int8 measure 0.927x bf16 on
    v5e (BASELINE.md); activations beyond the calibrated range saturate
    at +-127."""
    import copy

    import jax

    ccfg = copy.copy(cfg)
    ccfg["serve_quant"] = "int8_calibrate"
    model = build_model(ccfg)

    first = jax.jit(lambda v, s: model.apply(
        v, s, False, mutable=["act_scales"]))
    scales = None
    for spec in spec_batches:
        spec = jnp.asarray(spec)
        variables = {"params": params, "batch_stats": batch_stats}
        if scales is not None:
            variables["act_scales"] = scales
        _, upd = first(variables, spec)
        scales = upd["act_scales"]
    if scales is None:
        raise ValueError("calibrate_act_scales: no calibration batches")
    return scales
