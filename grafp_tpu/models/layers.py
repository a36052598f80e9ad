"""Shared NN building blocks (channels-last, TPU-friendly).

Counterparts of the reference's gcn_lib/torch_nn.py primitives, designed
for (B, N, C) node tensors: pointwise "convs" are Dense/einsum matmuls
(MXU), BatchNorm reduces over (B, N), and initializers reproduce the
reference's effective statistics (torch Conv2d/Linear defaults are
kaiming-uniform with a=sqrt(5); BasicConv re-inits with kaiming-normal,
torch_nn.py:68-76).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch nn.Conv2d/nn.Linear default weight init: kaiming_uniform(a=sqrt(5))
# == variance_scaling(scale=1/3, fan_in, uniform).
torch_default_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
# torch kaiming_normal_ (BasicConv / peak extractor re-init).
kaiming_normal_init = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
kaiming_normal_fan_out_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def torch_bias_init(fan_in: int) -> Callable:
    """torch conv/linear bias default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def act_layer(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Activation registry (reference torch_nn.py:9-25)."""
    name = name.lower()
    if name == "relu":
        return nn.relu
    if name == "leakyrelu":
        return lambda x: nn.leaky_relu(x, negative_slope=0.2)
    if name == "gelu":
        return nn.gelu
    if name == "hswish":
        return nn.hard_swish
    if name == "elu":
        return nn.elu
    raise NotImplementedError(f"activation [{name}] is not found")


class BatchNorm(nn.Module):
    """BatchNorm over (B, N[, ...]) per channel, torch-compatible defaults
    (eps 1e-5, momentum 0.1 i.e. flax momentum 0.9). Set axis_name to sync
    statistics across the data mesh axis (the reference's DataParallel
    uses per-replica stats, so the default is local)."""

    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=self.axis_name,
            dtype=self.dtype,
        )(x)


def _int8_matmul_core(x, w, sx):
    """Shared int8 MXU matmul: quantize x by the (scalar) activation
    scale sx and w by per-output-channel scales, int32-accumulate,
    dequantize in f32."""
    sw = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True), 1e-8)
    sw = (sw / 127.0).astype(jnp.float32)
    qw = jnp.round(w.astype(jnp.float32) / sw).astype(jnp.int8)
    qx = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                  -127.0, 127.0).astype(jnp.int8)
    y = jax.lax.dot_general(
        qx, qw,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * (sx * sw)


def int8_dynamic_matmul(x, w):
    """``x @ w`` on the MXU's int8 path (v5e: 394 TOPs = 2x the bf16
    rate): symmetric per-output-channel weight scales + one dynamic
    per-tensor activation scale, accumulated in int32 and dequantized in
    f32. Weight quantization is O(C_in*C_out) per call - noise next to
    the O(rows*C_in*C_out) matmul - so checkpoints stay full-precision
    and the param tree is untouched. Serving-only: selection/aggregation
    kernels and training stay bf16/f32. Measured 0.927x bf16 on v5e
    (BASELINE.md): the per-layer activation-max passes dominate - see
    int8_static_matmul for the calibrated variant without them."""
    sx = jnp.maximum(jnp.max(jnp.abs(x)), 1e-8).astype(jnp.float32) / 127.0
    return _int8_matmul_core(x, w, sx)


def int8_static_matmul(x, w, amax):
    """int8_dynamic_matmul with a STATIC activation scale: ``amax`` is a
    per-layer activation |max| calibrated offline (serve_quant
    'int8_calibrate' pass), so serving pays no dynamic max pass over the
    activation tensor - the hypothesis the round-3 0.927x dynamic-int8
    verdict left open (BASELINE.md). Out-of-calibration activations
    saturate at +-127 (standard static PTQ semantics)."""
    sx = jnp.maximum(amax.astype(jnp.float32), 1e-8) / 127.0
    return _int8_matmul_core(x, w, sx)


@jax.custom_vjp
def dense_matmul_bf16grad(x, w):
    """``einsum('...i,io->...o')`` with f32 accumulation/emission whose
    BACKWARD quantizes the cotangent to the input dtype before the two
    transpose matmuls.

    Why: a matmul with bf16 inputs and ``preferred_element_type=f32``
    emits f32, so its cotangent arrives in f32 and BOTH transpose
    matmuls (dx, dw) run off the MXU's native bf16 path. Round-4 bwd
    attribution (scripts/profile_bwd_stages.py) flagged this on the
    MRConv grouped-conv einsum — the one hot-path matmul that emits f32
    (nn.Dense(dtype=bf16) layers already emit bf16 cotangents). The
    forward here is bit-identical to the plain einsum; only the
    cotangent is quantized — the same deliberate precision trade the
    pallas kNN VJP documents (ops/pallas_knn.py:_one_backward), with
    bf16 training measured loss-equivalent end-to-end
    (scripts/bf16_train_study.py). In f32 the cast is a no-op."""
    return jnp.einsum("...i,io->...o", x, w,
                      preferred_element_type=jnp.float32)


def _dmm_fwd(x, w):
    return dense_matmul_bf16grad(x, w), (x, w)


def _dmm_bwd(res, g):
    x, w = res
    gq = g.astype(x.dtype)                       # bf16 quantization (no-op f32)
    dx = jnp.einsum("...o,io->...i", gq, w,
                    preferred_element_type=jnp.float32).astype(x.dtype)
    xm = x.reshape(-1, x.shape[-1])
    gm = gq.reshape(-1, gq.shape[-1])
    dw = jax.lax.dot_general(
        xm, gm, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w.dtype)
    return dx, dw


dense_matmul_bf16grad.defvjp(_dmm_fwd, _dmm_bwd)


def quant_mode(quant) -> Optional[str]:
    """Normalize the module `quant` knob: False/None -> None (dense),
    True -> 'dynamic' (back-compat), else one of
    'dynamic' | 'static' | 'calibrate'."""
    if not quant:
        return None
    if quant is True:
        return "dynamic"
    q = str(quant)
    if q not in ("dynamic", "static", "calibrate"):
        raise ValueError(f"quant mode must be dynamic|static|calibrate, "
                         f"got {quant!r}")
    return q


class _QuantDenseCore(nn.Module):
    """Param-compatible stand-in for ``nn.Dense`` (same ``kernel``/
    ``bias`` leaves; instantiated with name='Dense_0' so trained
    checkpoints load unchanged) whose matmul runs int8.

    mode: 'dynamic' (per-call activation max), 'static' (calibrated
    per-layer max from the 'act_scales' collection — no dynamic max
    pass), or 'calibrate' (exact dense matmul; records the running
    activation |max| into the mutable 'act_scales' collection)."""

    features: int
    use_bias: bool
    kernel_init: Callable
    bias_init: Callable
    dtype: Optional[jnp.dtype] = None
    mode: str = "dynamic"

    @nn.compact
    def __call__(self, x):
        w = self.param("kernel", self.kernel_init,
                       (x.shape[-1], self.features), jnp.float32)
        # cast the f32 dequant back to the layer compute dtype before the
        # bias add: with compute_dtype=bfloat16 an f32 emission doubles
        # inter-op HBM traffic vs the bf16 baseline (ADVICE r3 — note
        # this if the 0.927x on-chip int8 verdict is ever revisited)
        dt = self.dtype or x.dtype
        if self.mode == "dynamic":
            y = int8_dynamic_matmul(x, w).astype(dt)
        else:
            amax = self.variable("act_scales", "amax",
                                 lambda: jnp.zeros((), jnp.float32))
            if self.mode == "calibrate":
                y = jnp.dot(x.astype(dt), w.astype(dt),
                            preferred_element_type=jnp.float32).astype(dt)
                if not self.is_initializing():
                    amax.value = jnp.maximum(
                        amax.value, jnp.max(jnp.abs(x)).astype(jnp.float32))
            else:  # static
                y = int8_static_matmul(x, w, amax.value).astype(dt)
        if self.use_bias:
            b = self.param("bias", self.bias_init,
                           (self.features,), jnp.float32)
            y = y + b.astype(dt)
        return y


class PointwiseConv(nn.Module):
    """1x1 conv over node tensors == Dense on the channel axis.
    (Reference uses nn.Conv2d(C, C', 1) on (B, C, N, 1).)"""

    features: int
    use_bias: bool = True
    kernel_init: Callable = torch_default_init
    dtype: Optional[jnp.dtype] = None
    # int8 serving path (eval only): False | True ('dynamic') |
    # 'dynamic' | 'static' | 'calibrate' (see quant_mode)
    quant: Any = False

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        mode = quant_mode(self.quant)
        if mode:
            return _QuantDenseCore(
                self.features,
                use_bias=self.use_bias,
                kernel_init=self.kernel_init,
                bias_init=torch_bias_init(c_in),
                dtype=self.dtype,
                mode=mode,
                name="Dense_0",
            )(x)
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=torch_bias_init(c_in),
            dtype=self.dtype,
        )(x)


class GroupedPointwiseConv(nn.Module):
    """Grouped 1x1 conv (reference BasicConv: Conv2d(..., groups=4),
    torch_nn.py:56). Channels are split into `groups` consecutive blocks;
    block g of the output sees only block g of the input - a blocked
    einsum on the MXU."""

    features: int
    groups: int = 4
    use_bias: bool = True
    # Input is [a || b] channel-CONCAT but the (checkpoint-compatible)
    # grouped params are defined over the INTERLEAVED [a0, b0, a1, ...]
    # layout: apply as ONE dense matmul whose weight rows are permuted
    # and zero-padded off the group blocks (grouped convs at these tiny
    # per-group widths underfill the MXU, and this also deletes the
    # (B, N, 2C) interleave pass the pair layout needs).
    concat_interleaved: bool = False
    dtype: Optional[jnp.dtype] = None
    # int8 serving path (eval only): False | True | 'dynamic' |
    # 'static' | 'calibrate' (see quant_mode)
    quant: Any = False

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        g = self.groups
        assert c_in % g == 0 and self.features % g == 0, (c_in, self.features, g)
        cig, cog = c_in // g, self.features // g
        # kaiming_normal over the torch fan_in (c_in/groups)
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
            (g, cig, cog),
            jnp.float32,
        )
        dt = self.dtype or x.dtype
        mode = quant_mode(self.quant)
        if mode:
            # the dense-expanded weight keeps per-output-channel scales
            # exact (off-block zeros quantize to 0); grouped einsum at
            # these tiny per-group widths underfills the MXU anyway, so
            # the int8 path always goes through the dense form
            dense = (grouped_as_concat_dense(w, c_in, self.features)
                     if self.concat_interleaved else
                     _grouped_as_blockdiag_dense(w, c_in, self.features))
            # cast the f32 dequant back to the compute dtype (ADVICE r3:
            # f32 emissions double inter-op HBM traffic under bf16)
            if mode == "dynamic":
                y = int8_dynamic_matmul(x, dense).astype(dt)
            else:
                amax = self.variable("act_scales", "amax",
                                     lambda: jnp.zeros((), jnp.float32))
                if mode == "calibrate":
                    y = jnp.einsum(
                        "...i,io->...o", x.astype(dt), dense.astype(dt),
                        preferred_element_type=jnp.float32,
                    ).astype(dt)
                    if not self.is_initializing():
                        amax.value = jnp.maximum(
                            amax.value,
                            jnp.max(jnp.abs(x)).astype(jnp.float32))
                else:  # static
                    y = int8_static_matmul(x, dense, amax.value).astype(dt)
        elif self.concat_interleaved:
            dense = grouped_as_concat_dense(w, c_in, self.features)
            # custom-VJP matmul: identical forward, bf16 cotangent in
            # the backward transposes (round-4 bwd attribution)
            y = dense_matmul_bf16grad(x.astype(dt), dense.astype(dt))
        else:
            xg = x.reshape(*x.shape[:-1], g, cig)
            xg, wg = xg.astype(dt), w.astype(dt)
            if jax.default_backend() == "cpu" and xg.dtype == jnp.bfloat16:
                # XLA:CPU's DotThunk has no BF16xBF16=F32 kernel for this
                # grouped (batch-dim-on-rhs) layout (jax 0.9.0, runtime
                # UNIMPLEMENTED); upcast there — the result is f32 either
                # way, and the TPU path below is untouched.
                xg, wg = xg.astype(jnp.float32), wg.astype(jnp.float32)
            y = jnp.einsum(
                "...gi,gio->...go", xg, wg,
                preferred_element_type=jnp.float32,
            )
            y = y.reshape(*x.shape[:-1], self.features)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + b.astype(y.dtype)  # no-op f32 path; keeps quant bf16
        return y


def _grouped_as_blockdiag_dense(w, c_in: int, c_out: int):
    """(g, cig, cog) grouped weights -> the equivalent block-diagonal
    dense (c_in, c_out) weight over the NATIVE consecutive-block channel
    layout (no interleave permutation)."""
    g, cig, cog = w.shape
    bd = jnp.zeros((g, cig, g, cog), w.dtype)
    bd = bd.at[jnp.arange(g), :, jnp.arange(g), :].set(w)
    return bd.reshape(c_in, c_out)


def grouped_as_concat_dense(w, c_in: int, c_out: int):
    """(g, cig, cog) grouped weights over an INTERLEAVED input layout ->
    dense (c_in, c_out) weight for the equivalent CONCAT-layout matmul.

    Row p of the dense weight is row interleave(p) of the block-diagonal
    expansion, where interleave maps concat position p (first half = the
    'a' tensor, second half = 'b') to interleaved channel 2p / 2p'+1.
    Zero entries off the blocks contribute exactly 0 for finite inputs."""
    import numpy as np

    g, cig, cog = w.shape
    bd = jnp.zeros((g, cig, g, cog), w.dtype)
    bd = bd.at[jnp.arange(g), :, jnp.arange(g), :].set(w)
    bd = bd.reshape(c_in, c_out)                 # rows: interleaved order
    half = c_in // 2
    perm = np.concatenate([2 * np.arange(half), 2 * np.arange(half) + 1])
    return bd[perm]


# --- param mirrors for the fused-Grapher serving kernel -------------------
#
# grapher_block_pallas (ops/pallas_knn.py) consumes the block's weights
# directly, so the module must DECLARE the exact same param/variable
# tree as the unfused path without running the unfused ops. Each mirror
# reproduces its counterpart's child names, shapes and initializers
# leaf-for-leaf (verified against trained checkpoints in
# tests/test_fused_grapher.py), so checkpoints load unchanged and
# init() is path-independent.


class _DenseParamsCore(nn.Module):
    """Mirror of nn.Dense's params; instantiate with name='Dense_0'."""

    features: int
    use_bias: bool
    kernel_init: Callable
    bias_init: Callable

    @nn.compact
    def __call__(self, c_in: int):
        w = self.param("kernel", self.kernel_init,
                       (c_in, self.features), jnp.float32)
        b = (self.param("bias", self.bias_init, (self.features,), jnp.float32)
             if self.use_bias else None)
        return w, b


class PointwiseConvParams(nn.Module):
    """Param mirror of PointwiseConv: returns (kernel, bias)."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = torch_default_init

    @nn.compact
    def __call__(self, c_in: int):
        return _DenseParamsCore(
            self.features, use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=torch_bias_init(c_in), name="Dense_0",
        )(c_in)


class GroupedPointwiseConvParams(nn.Module):
    """Param mirror of GroupedPointwiseConv: returns ((g, cig, cog)
    kernel, bias)."""

    features: int
    groups: int = 4
    use_bias: bool = True

    @nn.compact
    def __call__(self, c_in: int):
        g = self.groups
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
            (g, c_in // g, self.features // g),
            jnp.float32,
        )
        b = (self.param("bias", nn.initializers.zeros,
                        (self.features,), jnp.float32)
             if self.use_bias else None)
        return w, b


class _BNParamsCore(nn.Module):
    """Mirror of nn.BatchNorm's params/stats; instantiate with
    name='BatchNorm_0'. Returns the eval-mode (scale, shift) affine."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.features,), jnp.float32))
        s = scale * jax.lax.rsqrt(var.value + 1e-5)
        return s, bias - mean.value * s


class BatchNormAffine(nn.Module):
    """Param mirror of layers.BatchNorm (wrapper -> nn.BatchNorm child
    'BatchNorm_0'): returns eval-mode (s, t) with BN(x) == x*s + t."""

    @nn.compact
    def __call__(self, features: int):
        return _BNParamsCore(features, name="BatchNorm_0")()


class MRConvParams(nn.Module):
    """Param mirror of MRConv (gconv): returns (grouped kernel, bias,
    bn_s, bn_t). Child names match MRConv's auto-named
    GroupedPointwiseConv_0 / BatchNorm_0."""

    out_features: int
    groups: int = 4

    @nn.compact
    def __call__(self, c_in: int):
        w, b = GroupedPointwiseConvParams(
            self.out_features, groups=self.groups,
            name="GroupedPointwiseConv_0")(c_in)
        s, t = BatchNormAffine(name="BatchNorm_0")(self.out_features)
        return w, b, s, t


class DropPath(nn.Module):
    """Per-sample stochastic depth. The reference wires DropPath but its
    ramp never engages (graph_encoder.py:139-151 never increments the
    block index, so every block gets rate 0); supported here for the
    'ramp' schedule."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool):
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))
