"""Checkpointing: Orbax-native save/restore + a one-way importer for the
reference's torch ``.pth`` checkpoints.

Native format: an Orbax PyTree checkpoint per tag under
``<folder>/model_<name>_<tag>/`` holding params / batch_stats /
opt_state / epoch / loss log / hit-rate log - the same payload as the
reference's single-file pickle (train.py:212-220, util.py:111-122),
with the reference's ``model_{name}_{current|best|epoch}`` naming.

Torch import (test_fp.py:290-297 contract): strips DataParallel
``module.`` prefixes, drops the dead ``relative_pos`` buffers
(torch_vertex.py:164-172 - never used in forward), and transposes
torch conv/linear layouts into our channels-last flax tree. The
reference's Downsample 3x3 convs keep only their center kernel column
(the width-1 input makes the other columns provably dead - see
models/gnn.py docstring).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict


# ---------------------------------------------------------------------------
# Orbax native checkpoints
# ---------------------------------------------------------------------------

def _ckpt_path(model_folder: str, model_name: str, text) -> str:
    return os.path.abspath(
        os.path.join(model_folder, f"model_{model_name}_{text}")
    )


def save_ckp(state_payload: Dict[str, Any], model_name: str,
             model_folder: str, text) -> str:
    """Reference util.py:118-122 contract, Orbax backend."""
    import orbax.checkpoint as ocp

    os.makedirs(model_folder, exist_ok=True)
    path = _ckpt_path(model_folder, model_name, text)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, state_payload, force=True)
    return path


def load_ckp(checkpoint_fpath: str, template: Optional[Dict] = None) -> Dict:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    if template is not None:
        return ckptr.restore(os.path.abspath(checkpoint_fpath), item=template)
    return ckptr.restore(os.path.abspath(checkpoint_fpath))


# ---------------------------------------------------------------------------
# Torch .pth import
# ---------------------------------------------------------------------------

def _strip_module_prefix(sd: Dict[str, Any]) -> Dict[str, Any]:
    if any(k.startswith("module.") for k in sd):
        return {k.replace("module.", "", 1): v for k, v in sd.items()}
    return sd


def _conv2d_to_hwio(w: np.ndarray) -> np.ndarray:
    """torch (O, I, kh, kw) -> flax (kh, kw, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def _pointwise_to_dense(w: np.ndarray) -> np.ndarray:
    """torch 1x1 conv (O, I, 1, 1) -> Dense kernel (I, O)."""
    return np.transpose(w[:, :, 0, 0], (1, 0))


def _grouped_pointwise(w: np.ndarray, groups: int) -> np.ndarray:
    """torch grouped 1x1 conv (O, I/g, 1, 1) -> ours (g, I/g, O/g)."""
    o, ig = w.shape[0], w.shape[1]
    og = o // groups
    return np.transpose(
        w[:, :, 0, 0].reshape(groups, og, ig), (0, 2, 1)
    )


def _downsample_conv(w: np.ndarray) -> np.ndarray:
    """torch (O, I, 3, 3) -> length-3 flax Conv kernel (3, I, O), keeping
    the center width column (the only live one on width-1 inputs)."""
    return np.transpose(w[:, :, :, 1], (2, 1, 0))


def _torch_backbone_positions() -> Dict[int, Tuple[str, int]]:
    """torch flat-Seq position -> ('block', idx) or ('down', stage).
    Stage layout (graph_encoder.py:139-152): blocks [2,2,6,2] with a
    Downsample before stages 1..3."""
    pos = {}
    p = 0
    idx = 0
    for stage, nb in enumerate((2, 2, 6, 2)):
        if stage > 0:
            pos[p] = ("down", stage)
            p += 1
        for _ in range(nb):
            pos[p] = ("block", idx)
            p += 1
            idx += 1
    return pos


def torch_state_dict_to_tree(
    sd: Dict[str, np.ndarray]
) -> Tuple[Dict, Dict]:
    """Map a reference SimCLR(GraphEncoder) state_dict (numpy values) to
    (params, batch_stats) flax trees."""
    sd = _strip_module_prefix(sd)
    sd = {k: np.asarray(v) for k, v in sd.items()
          if "relative_pos" not in k and "num_batches_tracked" not in k}

    P: Dict[Tuple[str, ...], np.ndarray] = {}
    S: Dict[Tuple[str, ...], np.ndarray] = {}

    def bn(dst_prefix: Tuple[str, ...], src_prefix: str):
        P[dst_prefix + ("scale",)] = sd[f"{src_prefix}.weight"]
        P[dst_prefix + ("bias",)] = sd[f"{src_prefix}.bias"]
        S[dst_prefix + ("mean",)] = sd[f"{src_prefix}.running_mean"]
        S[dst_prefix + ("var",)] = sd[f"{src_prefix}.running_var"]

    # peak extractor (peak_extractor.py:22-30)
    P[("peak", "conv", "kernel")] = _conv2d_to_hwio(
        sd["peak_extractor.convs.0.weight"]
    )
    P[("peak", "conv", "bias")] = sd["peak_extractor.convs.0.bias"]

    # stem (graph_encoder.py:131-133)
    P[("encoder", "stem", "Dense_0", "kernel")] = _pointwise_to_dense(
        sd["encoder.stem.0.weight"]
    )
    bn(("encoder", "stem_bn", "BatchNorm_0"), "encoder.stem.1")

    for p, (kind, i) in _torch_backbone_positions().items():
        src = f"encoder.backbone.{p}"
        if kind == "down":
            P[("encoder", f"down{i}", "conv", "kernel")] = _downsample_conv(
                sd[f"{src}.conv.0.weight"]
            )
            P[("encoder", f"down{i}", "conv", "bias")] = sd[f"{src}.conv.0.bias"]
            bn(("encoder", f"down{i}", "bn", "BatchNorm_0"), f"{src}.conv.1")
            continue
        g = ("encoder", f"block{i}_grapher")
        P[g + ("fc1", "Dense_0", "kernel")] = _pointwise_to_dense(
            sd[f"{src}.0.fc1.0.weight"]
        )
        P[g + ("fc1", "Dense_0", "bias")] = sd[f"{src}.0.fc1.0.bias"]
        bn(g + ("fc1_bn", "BatchNorm_0"), f"{src}.0.fc1.1")
        P[g + ("gconv", "GroupedPointwiseConv_0", "kernel")] = _grouped_pointwise(
            sd[f"{src}.0.graph_conv.gconv.nn.0.weight"], groups=4
        )
        P[g + ("gconv", "GroupedPointwiseConv_0", "bias")] = sd[
            f"{src}.0.graph_conv.gconv.nn.0.weight".replace("weight", "bias")
        ]
        bn(g + ("gconv", "BatchNorm_0", "BatchNorm_0"),
           f"{src}.0.graph_conv.gconv.nn.1")
        P[g + ("fc2", "Dense_0", "kernel")] = _pointwise_to_dense(
            sd[f"{src}.0.fc2.0.weight"]
        )
        P[g + ("fc2", "Dense_0", "bias")] = sd[f"{src}.0.fc2.0.bias"]
        bn(g + ("fc2_bn", "BatchNorm_0"), f"{src}.0.fc2.1")

        f = ("encoder", f"block{i}_ffn")
        P[f + ("fc1", "Dense_0", "kernel")] = _pointwise_to_dense(
            sd[f"{src}.1.fc1.0.weight"]
        )
        bn(f + ("fc1_bn", "BatchNorm_0"), f"{src}.1.fc1.1")
        P[f + ("fc2", "Dense_0", "kernel")] = _pointwise_to_dense(
            sd[f"{src}.1.fc2.0.weight"]
        )
        bn(f + ("fc2_bn", "BatchNorm_0"), f"{src}.1.fc2.1")

    # head + projector (graph_encoder.py:156, simclr.py:24-27)
    P[("encoder", "proj", "Dense_0", "kernel")] = _pointwise_to_dense(
        sd["encoder.proj.weight"]
    )
    P[("encoder", "proj", "Dense_0", "bias")] = sd["encoder.proj.bias"]
    P[("projector", "fc1", "kernel")] = np.transpose(sd["projector.0.weight"])
    P[("projector", "fc1", "bias")] = sd["projector.0.bias"]
    P[("projector", "fc2", "kernel")] = np.transpose(sd["projector.2.weight"])
    P[("projector", "fc2", "bias")] = sd["projector.2.bias"]

    to_f32 = lambda t: {k: np.asarray(v, np.float32) for k, v in t.items()}
    return unflatten_dict(to_f32(P)), unflatten_dict(to_f32(S))


def torch_ast_state_dict_to_tree(sd: Dict[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """Map a reference SimCLR(ASTEncoder) state_dict (ast_encoder.py:
    278-415) to (params, batch_stats={}) for models/ast.ASTEncoder."""
    sd = _strip_module_prefix(sd)
    sd = {k: np.asarray(v) for k, v in sd.items()}
    P: Dict[Tuple[str, ...], np.ndarray] = {}
    e = ("encoder",)
    # patchify conv (O, I, kh, kw) -> (kh, kw, I, O)
    P[e + ("patch", "kernel")] = _conv2d_to_hwio(
        sd["encoder.patch_embed.projection.weight"])
    P[e + ("patch", "bias")] = sd["encoder.patch_embed.projection.bias"]
    P[e + ("cls_token",)] = sd["encoder.cls_token"]
    P[e + ("pos_embed",)] = sd["encoder.pos_embed"]
    depth = max(
        int(k.split(".")[2]) for k in sd if k.startswith("encoder.blocks.")
    ) + 1
    for i in range(depth):
        src = f"encoder.blocks.{i}"
        blk = e + (f"block{i}",)
        for ln, dst in (("norm1", "norm1"), ("norm2", "norm2")):
            P[blk + (dst, "scale")] = sd[f"{src}.{ln}.weight"]
            P[blk + (dst, "bias")] = sd[f"{src}.{ln}.bias"]
        for lin, dst in (("attn.qkv", "qkv"), ("attn.proj", "proj"),
                         ("mlp.fc1", "mlp_fc1"), ("mlp.fc2", "mlp_fc2")):
            P[blk + (dst, "kernel")] = np.transpose(sd[f"{src}.{lin}.weight"])
            P[blk + (dst, "bias")] = sd[f"{src}.{lin}.bias"]
    P[e + ("norm", "scale")] = sd["encoder.norm.weight"]
    P[e + ("norm", "bias")] = sd["encoder.norm.bias"]
    P[e + ("head", "kernel")] = np.transpose(sd["encoder.head.weight"])
    P[e + ("head", "bias")] = sd["encoder.head.bias"]
    P[("projector", "fc1", "kernel")] = np.transpose(sd["projector.0.weight"])
    P[("projector", "fc1", "bias")] = sd["projector.0.bias"]
    P[("projector", "fc2", "kernel")] = np.transpose(sd["projector.2.weight"])
    P[("projector", "fc2", "bias")] = sd["projector.2.bias"]
    to_f32 = {k: np.asarray(v, np.float32) for k, v in P.items()}
    return unflatten_dict(to_f32), {}


def torch_nafp_state_dict_to_tree(sd: Dict[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """Map a reference SimCLR(NAFPEncoder) state_dict
    (neural_audio_fp.py:12-46: Sequential indices 6i conv-a, 6i+1 ln-a,
    6i+3 conv-b, 6i+4 ln-b) to models/nafp.NAFPEncoder."""
    sd = _strip_module_prefix(sd)
    sd = {k: np.asarray(v) for k, v in sd.items()}
    P: Dict[Tuple[str, ...], np.ndarray] = {}
    e = ("encoder",)
    n_stages = sum(
        1 for k in sd if k.startswith("encoder.conv_layers.")
        and k.endswith(".weight") and np.asarray(sd[k]).ndim == 4
    ) // 2
    for i in range(n_stages):
        P[e + (f"conv{i}a", "kernel")] = _conv2d_to_hwio(
            sd[f"encoder.conv_layers.{6 * i}.weight"])
        P[e + (f"conv{i}a", "bias")] = sd[f"encoder.conv_layers.{6 * i}.bias"]
        # torch LN shape (C, H, W) -> ours (H, W, C)
        P[e + (f"ln{i}a", "scale")] = np.transpose(
            sd[f"encoder.conv_layers.{6 * i + 1}.weight"], (1, 2, 0))
        P[e + (f"ln{i}a", "bias")] = np.transpose(
            sd[f"encoder.conv_layers.{6 * i + 1}.bias"], (1, 2, 0))
        P[e + (f"conv{i}b", "kernel")] = _conv2d_to_hwio(
            sd[f"encoder.conv_layers.{6 * i + 3}.weight"])
        P[e + (f"conv{i}b", "bias")] = sd[f"encoder.conv_layers.{6 * i + 3}.bias"]
        P[e + (f"ln{i}b", "scale")] = np.transpose(
            sd[f"encoder.conv_layers.{6 * i + 4}.weight"], (1, 2, 0))
        P[e + (f"ln{i}b", "bias")] = np.transpose(
            sd[f"encoder.conv_layers.{6 * i + 4}.bias"], (1, 2, 0))
    P[("projector", "fc1", "kernel")] = np.transpose(sd["projector.0.weight"])
    P[("projector", "fc1", "bias")] = sd["projector.0.bias"]
    P[("projector", "fc2", "kernel")] = np.transpose(sd["projector.2.weight"])
    P[("projector", "fc2", "bias")] = sd["projector.2.bias"]
    to_f32 = {k: np.asarray(v, np.float32) for k, v in P.items()}
    return unflatten_dict(to_f32), {}


def import_torch_checkpoint(path: str, arch: str = "grafp") -> Tuple[Dict, Dict, Dict]:
    """Load a reference .pth -> (params, batch_stats, meta). Requires
    torch (CPU) for unpickling. arch selects the key mapping
    ('grafp' | 'ast' | 'nafp'); auto-detected from the keys when the
    state_dict makes it unambiguous."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    sd_np = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    keys = set(_strip_module_prefix(sd_np).keys())
    if any(k.startswith("encoder.blocks.") for k in keys):
        arch = "ast"
    elif any(k.startswith("encoder.conv_layers.") for k in keys):
        arch = "nafp"
    if arch == "ast":
        params, batch_stats = torch_ast_state_dict_to_tree(sd_np)
    elif arch == "nafp":
        params, batch_stats = torch_nafp_state_dict_to_tree(sd_np)
    else:
        params, batch_stats = torch_state_dict_to_tree(sd_np)
    meta = {k: ckpt[k] for k in ("epoch", "loss", "valid_acc", "hit_rate")
            if isinstance(ckpt, dict) and k in ckpt}
    return params, batch_stats, meta


def verify_tree_shapes(imported: Dict, template: Dict, name: str) -> None:
    """Raise with a readable diff if the imported tree doesn't match."""
    a = {"/".join(k): v.shape for k, v in flatten_dict(imported).items()}
    b = {"/".join(k): v.shape for k, v in flatten_dict(template).items()}
    missing = sorted(set(b) - set(a))
    extra = sorted(set(a) - set(b))
    bad = sorted(k for k in set(a) & set(b) if tuple(a[k]) != tuple(b[k]))
    if missing or extra or bad:
        msg = [f"torch import mismatch in {name}:"]
        if missing:
            msg.append(f"  missing: {missing[:8]}{'...' if len(missing) > 8 else ''}")
        if extra:
            msg.append(f"  extra: {extra[:8]}{'...' if len(extra) > 8 else ''}")
        for k in bad[:8]:
            msg.append(f"  shape {k}: got {a[k]} want {b[k]}")
        raise ValueError("\n".join(msg))
