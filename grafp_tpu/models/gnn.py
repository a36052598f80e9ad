"""ViG-style dynamic-graph encoder (Max-Relative graph convolution).

From-scratch TPU-native redesign of the reference's GraphEncoder
(encoder/graph_encoder.py:69-191 + encoder/gcn_lib/*): node tensors are
channels-last (B, N, C); every Grapher block rebuilds a k-NN graph from
its current features (one MXU matmul + top_k, ops/knn.py) and applies
MRConv: x' = GroupedConv(interleave(x, max_k(x_nbr) - x)).

Faithfulness notes (verified against the reference source):
  * size 't': blocks [2,2,6,2], channels [64,128,256,512], 12
    Grapher+FFN pairs with a stride-2 Downsample between stages
    (graph_encoder.py:96-99,139-152). N: 1024 -> 512 -> 256 -> 128.
  * The reference never increments its block counter, so every block
    effectively runs k=3, dilation=1, drop_path=0
    (graph_encoder.py:139-151). `dilation_schedule='reference'`
    reproduces that; 'ramp' gives the presumably-intended
    min(idx//4+1, 128//k) ramp.
  * Downsample is Conv2d 3x3 stride (2,2) pad 1 on (B, C, N, 1); with
    spatial width 1 only the kernel's center column ever touches data,
    so it is exactly a length-3 stride-2 conv along N
    (graph_encoder.py:16-28).
  * MRConv interleaves [x_c, rel_c] channel pairs before the grouped
    conv (torch_vertex.py:29-32's stack+reshape); the grouped conv has
    groups=4 (torch_nn.py:56). Since x_i is constant across the k
    neighbors, max_k(x_j - x_i) == max_k(x_j) - x_i - we hoist the
    subtraction out of the gather (saves a (B,N,k,C) intermediate).
  * The sincos relative_pos bias exists in reference state_dicts but is
    never applied in forward (torch_vertex.py:188-190); we neither
    build nor store it (the .pth importer drops those keys).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from grafp_tpu.models.layers import (
    BatchNorm,
    DropPath,
    GroupedPointwiseConv,
    PointwiseConv,
    act_layer,
    torch_bias_init,
    torch_default_init,
)
from grafp_tpu.ops.knn import dilate_neighbors, gather_neighbors, knn_graph

SIZE_PRESETS = {
    # size: (blocks per stage, channels per stage)  graph_encoder.py:96-110
    "t": ((2, 2, 6, 2), (64, 128, 256, 512)),
    "s": ((2, 2, 6, 2), (80, 160, 400, 640)),
    "m": ((2, 2, 16, 2), (96, 192, 384, 768)),
    "l": ((2, 2, 18, 2), (128, 256, 512, 1024)),
}


class MRConv(nn.Module):
    """Max-Relative graph conv: out = GroupedConv([x || max_k(x_nbr)-x])
    with channel interleave, then BN + act (torch_vertex.py:11-34).
    The neighbor max is computed by the caller (strategy-dependent)."""

    out_features: int
    act: str = "relu"
    groups: int = 4
    # 'pair': x, rel given separately, interleave then grouped conv.
    # 'concat': x IS the fused kernel's (B, N, 2C) [x || rel - x] output;
    # the interleave lives in the conv's weight permutation. Both
    # layouts share identical parameters (checkpoint-compatible).
    input_layout: str = "pair"
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    quant: Any = False

    @nn.compact
    def __call__(self, x, rel, train: bool):
        if self.input_layout == "concat":
            y = x                                          # (B, N, 2C)
            y = GroupedPointwiseConv(
                self.out_features, groups=self.groups, dtype=self.dtype,
                concat_interleaved=True, quant=self.quant,
            )(y)
        else:
            # x, rel: (B, N, C); rel = max_k(x_nbr) - x
            b, n, c = x.shape
            # interleave channels: [x_0, rel_0, x_1, rel_1, ...]
            y = jnp.stack([x, rel], axis=-1).reshape(b, n, 2 * c)
            y = GroupedPointwiseConv(
                self.out_features, groups=self.groups, dtype=self.dtype,
                quant=self.quant,
            )(y)
        y = BatchNorm(axis_name=self.axis_name, dtype=self.dtype)(y, train)
        return act_layer(self.act)(y)


class EdgeConv(nn.Module):
    """EdgeConv (torch_vertex.py:37-52): max over neighbors of
    GroupedConv([x_i || x_j - x_i]). Needs explicit neighbor indices."""

    out_features: int
    act: str = "relu"
    groups: int = 4
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    quant: Any = False

    @nn.compact
    def __call__(self, x, idx, train: bool):
        nbrs = gather_neighbors(x, idx)                    # (B, N, k, C)
        ctr = x[:, :, None, :]
        feats = jnp.concatenate(
            [jnp.broadcast_to(ctr, nbrs.shape), nbrs - ctr], axis=-1
        )                                                  # (B, N, k, 2C)
        y = GroupedPointwiseConv(
            self.out_features, groups=self.groups, dtype=self.dtype,
            quant=self.quant,
        )(feats)
        y = BatchNorm(axis_name=self.axis_name, dtype=self.dtype)(y, train)
        y = act_layer(self.act)(y)
        return jnp.max(y, axis=2)


class SAGEConv(nn.Module):
    """GraphSAGE (torch_vertex.py:55-70): GroupedConv([x || max_k
    Conv(x_j)])."""

    out_features: int
    act: str = "relu"
    groups: int = 4
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    quant: Any = False

    @nn.compact
    def __call__(self, x, idx, train: bool):
        c = x.shape[-1]
        h = GroupedPointwiseConv(c, groups=self.groups, dtype=self.dtype,
                                 quant=self.quant, name="nn1")(x)
        h = BatchNorm(axis_name=self.axis_name, dtype=self.dtype,
                      name="nn1_bn")(h, train)
        h = act_layer(self.act)(h)
        agg = jnp.max(gather_neighbors(h, idx), axis=2)
        y = jnp.concatenate([x, agg], axis=-1)
        y = GroupedPointwiseConv(self.out_features, groups=self.groups,
                                 dtype=self.dtype, quant=self.quant,
                                 name="nn2")(y)
        y = BatchNorm(axis_name=self.axis_name, dtype=self.dtype,
                      name="nn2_bn")(y, train)
        return act_layer(self.act)(y)


class GINConv(nn.Module):
    """GIN (torch_vertex.py:73-89): Conv((1+eps)*x + sum_k x_j)."""

    out_features: int
    act: str = "relu"
    groups: int = 4
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    quant: Any = False

    @nn.compact
    def __call__(self, x, idx, train: bool):
        eps = self.param("eps", nn.initializers.zeros, (), jnp.float32)
        agg = jnp.sum(gather_neighbors(x, idx), axis=2)
        y = (1.0 + eps) * x + agg
        y = GroupedPointwiseConv(self.out_features, groups=self.groups,
                                 dtype=self.dtype, quant=self.quant)(y)
        y = BatchNorm(axis_name=self.axis_name, dtype=self.dtype)(y, train)
        return act_layer(self.act)(y)


class Grapher(nn.Module):
    """fc1 -> dynamic kNN graph -> MRConv (C->2C) -> fc2 (2C->C) + residual
    (torch_vertex.py:142-194)."""

    features: int
    k: int = 3
    dilation: int = 1
    conv: str = "mr"  # 'mr' | 'edge' | 'sage' | 'gin' (dispatcher parity)
    act: str = "relu"
    drop_path: float = 0.0
    knn_block_rows: int = 0
    knn_strategy: str = "auto"  # see ops/mrconv_neighbors.py
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    quant: Any = False  # int8 matmuls, serving only (layers.quant_mode)
    # whole-block serving kernel: 'auto' | 'on' | 'off'. Measured on
    # v5e (scripts/profile_fused_grapher.py, B=128 bf16): the fused
    # block LOSES at every stage shape (0.91-0.95x) - Mosaic's
    # per-program matmuls + the lost XLA epilogue pipelining cost more
    # than the saved boundary HBM traffic - so 'auto' resolves to OFF.
    # 'on' remains for future toolchains/hardware and for the
    # equivalence tests (tests/test_fused_grapher.py).
    fuse_serving: str = "auto"

    @nn.compact
    def __call__(self, x, train: bool):
        from grafp_tpu.ops.mrconv_neighbors import max_relative_neighbors

        strategy = self.knn_strategy
        if strategy == "auto":
            # measured on v5e (scripts/profile_train_strategies.py): the
            # kernel wins BOTH modes now that it has a real VMEM backward
            # (train B=256: 305 ms pallas vs 326 ms onehot; round 1's
            # onehot-recompute backward made pallas lose at 307 vs 275).
            if jax.default_backend() == "tpu":
                strategy = "pallas"
            else:
                strategy = "onehot"

        # Whole-block serving kernel: in eval the three BNs are plain
        # affines, so fc1+BN -> kNN select + MRConv conv+BN+relu ->
        # fc2+BN -> residual all fold into ONE pallas program whose HBM
        # traffic is x in / x out (round-3 per-stage profile: the
        # XLA-side passes around the frontend kernel held stage 1 at
        # 28% MFU). Training keeps the unfused custom-VJP path (live
        # batch stats, gradients).
        fused = (not train and self.conv == "mr" and self.dilation == 1
                 and strategy == "pallas" and self.act == "relu"
                 and not self.quant and self.fuse_serving == "on")
        if fused:
            from grafp_tpu.ops.pallas_knn import (
                grapher_block_pallas,
                grapher_block_supported,
            )

            dt = jnp.dtype(self.dtype) if self.dtype else x.dtype
            fused = grapher_block_supported(x.shape[1], self.features, dt,
                                            k=self.k)
        if fused:
            from grafp_tpu.models.layers import (
                BatchNormAffine,
                MRConvParams,
                PointwiseConvParams,
                grouped_as_concat_dense,
            )

            c = self.features
            w1, b1 = PointwiseConvParams(c, name="fc1")(x.shape[-1])
            s1, t1 = BatchNormAffine(name="fc1_bn")(c)
            wg, bg, sg, tg = MRConvParams(2 * c, name="gconv")(2 * c)
            w2, b2 = PointwiseConvParams(c, name="fc2")(2 * c)
            s2, t2 = BatchNormAffine(name="fc2_bn")(c)
            wgd = grouped_as_concat_dense(wg, 2 * c, 2 * c)
            return grapher_block_pallas(
                x.astype(dt), self.k,
                (w1 * s1).astype(dt), (b1 * s1 + t1)[None],
                (wgd * sg).astype(dt), (bg * sg + tg)[None],
                (w2 * s2).astype(dt), (b2 * s2 + t2)[None],
                interpret=jax.default_backend() != "tpu",
            )

        shortcut = x
        x = PointwiseConv(self.features, dtype=self.dtype, quant=self.quant,
                          name="fc1")(x)
        x = BatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="fc1_bn")(x, train)
        common = dict(act=self.act, axis_name=self.axis_name,
                      dtype=self.dtype, quant=self.quant, name="gconv")
        if self.conv == "mr":
            # fast path: MRConv only consumes the neighbor-feature max
            if self.dilation > 1 or strategy == "exact":
                idx = knn_graph(x, self.k * self.dilation,
                                block_rows=self.knn_block_rows)
                idx = dilate_neighbors(idx, self.dilation)
                rel = jnp.max(gather_neighbors(x, idx), axis=2) - x
                x = MRConv(self.features * 2, **common)(x, rel, train)
            elif strategy == "pallas":
                # fully-fused frontend: normalize + kNN select + max +
                # subtract + concat in ONE kernel (the pallas boundary
                # otherwise forces ~1.6 MB/item of HBM traffic per block
                # for the XLA-side normalize/sub/interleave passes)
                from grafp_tpu.ops.pallas_knn import mrconv_concat_pallas

                y = mrconv_concat_pallas(
                    x, self.k, jax.default_backend() != "tpu"
                )
                x = MRConv(self.features * 2, input_layout="concat",
                           **common)(y, None, train)
            else:
                rel = max_relative_neighbors(
                    x, self.k, strategy=strategy,
                    compute_dtype=self.dtype or jnp.float32,
                ) - x
                x = MRConv(self.features * 2, **common)(x, rel, train)
        else:
            # index-consuming variants (torch_vertex.py:92-107 dispatcher)
            idx = knn_graph(x, self.k * self.dilation,
                            block_rows=self.knn_block_rows)
            idx = dilate_neighbors(idx, self.dilation)
            cls = {"edge": EdgeConv, "sage": SAGEConv, "gin": GINConv}
            if self.conv not in cls:
                raise NotImplementedError(
                    f"conv:{self.conv} is not supported"
                )
            x = cls[self.conv](self.features * 2, **common)(x, idx, train)
        x = PointwiseConv(self.features, dtype=self.dtype, quant=self.quant,
                          name="fc2")(x)
        x = BatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="fc2_bn")(x, train)
        x = DropPath(self.drop_path)(x, train)
        return x + shortcut


class FFN(nn.Module):
    """Pointwise MLP with 4x expansion + residual (graph_encoder.py:45-67).
    fc convs are bias-free in the reference."""

    features: int
    hidden: int
    act: str = "relu"
    drop_path: float = 0.0
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    quant: Any = False

    @nn.compact
    def __call__(self, x, train: bool):
        shortcut = x
        y = PointwiseConv(self.hidden, use_bias=False, dtype=self.dtype,
                          quant=self.quant, name="fc1")(x)
        y = BatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="fc1_bn")(y, train)
        y = act_layer(self.act)(y)
        y = PointwiseConv(self.features, use_bias=False, dtype=self.dtype,
                          quant=self.quant, name="fc2")(y)
        y = BatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="fc2_bn")(y, train)
        y = DropPath(self.drop_path)(y, train)
        return y + shortcut


class Downsample(nn.Module):
    """Stride-2 conv along the node axis + BN (graph_encoder.py:16-28;
    see module docstring for the 3x3-on-width-1 == 3x1 equivalence)."""

    features: int
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        c_in = x.shape[-1]
        x = nn.Conv(
            self.features,
            kernel_size=(3,),
            strides=(2,),
            padding=((1, 1),),
            kernel_init=torch_default_init,
            bias_init=torch_bias_init(c_in * 3),
            dtype=self.dtype,
            name="conv",
        )(x)
        return BatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="bn")(x, train)


def dilation_for_block(idx: int, k: int, schedule: str) -> int:
    """Per-block dilation. 'reference' reproduces the shipped behavior
    (always 1; see module docstring); 'ramp' is min(idx//4+1, 128//k)
    (graph_encoder.py:127-128,147 as written)."""
    if schedule == "reference":
        return 1
    return min(idx // 4 + 1, max(128 // k, 1))


def drop_path_for_block(idx: int, n_blocks: int, peak: float, schedule: str) -> float:
    if schedule == "reference":
        return 0.0
    if n_blocks <= 1:
        return peak
    return peak * idx / (n_blocks - 1)


class GraphEncoder(nn.Module):
    """Isotropic-per-stage ViG pyramid -> (B, emb_dim) embedding
    (graph_encoder.py:69-191).

    Input: (B, N, C_in) node features (channels last; the reference takes
    (B, C, N)). Output: (B, emb_dims).
    """

    size: str = "t"
    k: int = 3
    conv: str = "mr"
    act: str = "relu"
    emb_dims: int = 1024
    dilation_schedule: str = "reference"
    drop_path: float = 0.1
    drop_path_schedule: str = "reference"
    knn_block_rows: int = 0
    knn_strategy: str = "auto"
    remat: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    quant: Any = False  # int8 serving path: False|'dynamic'|'static'|'calibrate'
    fuse_serving: str = "auto"  # whole-block serving kernel (see Grapher)

    @nn.compact
    def __call__(self, x, train: bool = False):
        blocks, channels = SIZE_PRESETS[self.size]
        n_blocks = sum(blocks)

        # Stem: pointwise conv (bias-free) + BN + LeakyReLU(0.2)
        # (graph_encoder.py:131-133).
        x = PointwiseConv(channels[0], use_bias=False, dtype=self.dtype,
                          quant=self.quant, name="stem")(x)
        x = BatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="stem_bn")(x, train)
        x = nn.leaky_relu(x, negative_slope=0.2)

        grapher_cls = Grapher
        ffn_cls = FFN
        if self.remat:
            grapher_cls = nn.remat(Grapher, static_argnums=(2,))
            ffn_cls = nn.remat(FFN, static_argnums=(2,))

        idx = 0
        for i, (nb, ch) in enumerate(zip(blocks, channels)):
            if i > 0:
                x = Downsample(
                    ch, axis_name=self.axis_name, dtype=self.dtype,
                    name=f"down{i}",
                )(x, train)
            for _ in range(nb):
                dil = dilation_for_block(idx, self.k, self.dilation_schedule)
                dp = drop_path_for_block(
                    idx, n_blocks, self.drop_path, self.drop_path_schedule
                )
                x = grapher_cls(
                    ch, k=self.k, dilation=dil, conv=self.conv,
                    act=self.act, drop_path=dp,
                    knn_block_rows=self.knn_block_rows,
                    knn_strategy=self.knn_strategy,
                    axis_name=self.axis_name, dtype=self.dtype,
                    quant=self.quant, fuse_serving=self.fuse_serving,
                    name=f"block{idx}_grapher",
                )(x, train)
                x = ffn_cls(
                    ch, hidden=ch * 4, act=self.act, drop_path=dp,
                    axis_name=self.axis_name, dtype=self.dtype,
                    quant=self.quant,
                    name=f"block{idx}_ffn",
                )(x, train)
                idx += 1

        # Projection head: 1x1 conv to emb_dims then mean over nodes
        # (graph_encoder.py:156,187-188).
        x = PointwiseConv(self.emb_dims, dtype=self.dtype, quant=self.quant,
                          name="proj")(x)
        return jnp.mean(x, axis=1)
