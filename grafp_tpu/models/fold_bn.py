"""Inference-time BatchNorm folding.

Every BatchNorm in the graph encoder follows a linear op (Dense /
grouped pointwise / strided conv), so at inference
    BN(xW + b) = x(W*s) + ((b - mu)*s + beta),  s = gamma/sqrt(var+eps)
and the BN pass can be skipped entirely. The stage-1/2 blocks are
HBM-bandwidth bound (scripts/profile_components.py: FFN runs at ~3% MXU
utilization), so removing 28 full-tensor normalization passes is a
direct serving-throughput win.

Usage (the model itself is unmodified - the folded tree neutralizes the
BN layers in place, so tree structure and checkpoints stay compatible):
    folded = fold_batch_norms(params, batch_stats)
    neutral = neutral_batch_stats(batch_stats)
    model.apply({'params': folded, 'batch_stats': neutral}, x, False)

Measured finding (v5e, scripts/profile_forward_variants.py): folding is
numerically exact but a perf NO-OP for the jitted forward - XLA already
fuses each inference BN into the preceding matmul's epilogue, so the 28
normalization passes the fold removes never exist in the compiled
program. Keep this module for export paths that serialize weights to
runtimes without that fusion; do not expect TPU serving gains.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict

EPS = 1e-5


def _fold_into(kernel, bias, scale, bn_bias, mean, var):
    """Returns (kernel', bias'). kernel's LAST axis is the BN channel."""
    s = scale / np.sqrt(var + EPS)
    k2 = kernel * s  # broadcasts over the last axis
    b = bias if bias is not None else 0.0
    b2 = (b - mean) * s + bn_bias
    return k2, b2


def fold_batch_norms(params: Dict, batch_stats: Dict) -> Dict:
    """Fold every (linear -> BN) pair in a SimCLR(GraphEncoder) tree."""
    P = {k: np.asarray(v) for k, v in flatten_dict(params).items()}
    S = {k: np.asarray(v) for k, v in flatten_dict(batch_stats).items()}

    # (linear path prefix, bn path prefix) pairs, discovered by walking
    # the tree: a BN wrapper named X_bn / bn / BatchNorm_0 pairs with the
    # sibling linear that feeds it.
    bn_keys = sorted({k[:-1] for k in S.keys()})  # (..., 'mean'/'var') -> prefix

    def linear_for(bn_prefix: Tuple[str, ...]):
        """Map a BN prefix to its producing linear op's param prefix."""
        # encoder/stem_bn/BatchNorm_0 -> encoder/stem/Dense_0
        parts = list(bn_prefix)
        assert parts[-1] == "BatchNorm_0"
        owner = parts[:-1]
        name = owner[-1]
        if name == "stem_bn":
            return tuple(owner[:-1] + ["stem", "Dense_0"])
        if name == "fc1_bn":
            return tuple(owner[:-1] + ["fc1", "Dense_0"])
        if name == "fc2_bn":
            return tuple(owner[:-1] + ["fc2", "Dense_0"])
        if name == "bn":  # Downsample
            return tuple(owner[:-1] + ["conv"])
        if name == "BatchNorm_0":  # MRConv: gconv/BatchNorm_0/BatchNorm_0
            return tuple(owner[:-1] + ["GroupedPointwiseConv_0"])
        raise KeyError(f"unrecognized BN site: {bn_prefix}")

    out = dict(P)
    for bn in bn_keys:
        lin = linear_for(bn)
        scale = P[bn + ("scale",)]
        beta = P[bn + ("bias",)]
        mean = S[bn + ("mean",)]
        var = S[bn + ("var",)]
        kkey = lin + ("kernel",)
        bkey = lin + ("bias",)
        kernel = out[kkey]
        bias = out.get(bkey)
        if kernel.ndim == 3 and "GroupedPointwiseConv_0" in lin:
            # (g, cig, cog): BN channel = flattened (g, cog)
            g, cig, cog = kernel.shape
            s = (scale / np.sqrt(var + EPS)).reshape(g, cog)
            k2 = kernel * s[:, None, :]
            b = bias if bias is not None else 0.0
            b2 = (b - mean) * s.reshape(-1) + beta
        else:
            k2, b2 = _fold_into(kernel, bias, scale, beta, mean, var)
        out[kkey] = k2.astype(np.float32)
        if bias is not None:
            out[bkey] = b2.astype(np.float32)
        else:
            # bias-free linear (stem/FFN): fold the shift into a new bias
            # is impossible without changing the tree; instead push the
            # shift into the BN layer by leaving BN as an add-only op.
            # Simpler: keep an identity-scale BN carrying only the bias.
            out[bn + ("scale",)] = np.ones_like(scale)
            out[bn + ("bias",)] = b2.astype(np.float32)
            continue
        # neutralize the BN itself
        out[bn + ("scale",)] = np.ones_like(scale)
        out[bn + ("bias",)] = np.zeros_like(beta)

    return unflatten_dict(out)


def neutral_batch_stats(batch_stats: Dict) -> Dict:
    """mean=0 / var=1-eps-compensated stats so an UNmodified model runs
    the folded params identically (BN becomes y = x*1 + bias)."""
    S = {k: np.asarray(v) for k, v in flatten_dict(batch_stats).items()}
    out = {}
    for k, v in S.items():
        if k[-1] == "mean":
            out[k] = np.zeros_like(v)
        else:  # var: choose var so 1/sqrt(var+eps) == 1
            out[k] = np.full_like(v, 1.0 - EPS)
    return unflatten_dict(out)
