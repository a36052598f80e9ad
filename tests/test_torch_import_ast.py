"""AST torch-checkpoint import parity (same approach as
test_torch_import.py: independent torch replica with reference key
names, randomized, imported, forward outputs compared)."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from grafp_tpu.core.config import config_from_dict, load_config  # noqa: E402
from grafp_tpu.models import build_model  # noqa: E402
from grafp_tpu.train.checkpoint import torch_ast_state_dict_to_tree  # noqa: E402

D, HEADS, DEPTH = 640, 10, 8


class _TBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = nn.LayerNorm(D, eps=1e-6)
        attn = nn.Module()
        attn.qkv = nn.Linear(D, 3 * D)
        attn.proj = nn.Linear(D, D)
        self.attn = attn
        self.norm2 = nn.LayerNorm(D, eps=1e-6)
        mlp = nn.Module()
        mlp.fc1 = nn.Linear(D, 4 * D)
        mlp.fc2 = nn.Linear(4 * D, D)
        self.mlp = mlp

    def forward(self, x):
        y = self.norm1(x)
        b, t, _ = y.shape
        hd = D // HEADS
        qkv = self.attn.qkv(y).reshape(b, t, 3, HEADS, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = (q @ k.transpose(-2, -1)) * (hd ** -0.5)
        a = a.softmax(dim=-1)
        o = (a @ v).transpose(1, 2).reshape(b, t, D)
        x = x + self.attn.proj(o)
        y = self.norm2(x)
        return x + self.mlp.fc2(F.gelu(self.mlp.fc1(y)))


def _build_torch_ast():
    model = nn.Module()
    enc = nn.Module()
    pe = nn.Module()
    pe.projection = nn.Conv2d(1, D, kernel_size=(64, 10), stride=(64, 10))
    enc.patch_embed = pe
    enc.cls_token = nn.Parameter(torch.zeros(1, 1, D))
    enc.pos_embed = nn.Parameter(torch.zeros(1, 11, D))
    enc.blocks = nn.ModuleList([_TBlock() for _ in range(DEPTH)])
    enc.norm = nn.LayerNorm(D, eps=1e-6)
    enc.head = nn.Linear(D, 1024)
    model.encoder = enc
    model.projector = nn.Sequential(
        nn.Linear(1024, 4096), nn.ELU(), nn.Linear(4096, 128)
    )

    def forward(spec):  # (B, 64, 100)
        x = spec.unsqueeze(1)
        x = enc.patch_embed.projection(x).flatten(2).transpose(1, 2)
        b = x.shape[0]
        x = torch.cat((enc.cls_token.expand(b, -1, -1), x), dim=1)
        x = x + enc.pos_embed
        for blk in enc.blocks:
            x = blk(x)
        x = enc.norm(x)
        h = enc.head(x[:, 0])
        z = model.projector(h)
        return h, F.normalize(z, p=2.0, dim=-1)

    model.fwd = forward
    return model


def test_ast_import_forward_parity(rng):
    tm = _build_torch_ast()
    g = torch.Generator().manual_seed(0)
    sd = tm.state_dict()
    for k, v in sd.items():
        fan_in = v[0].numel() if v.ndim >= 2 else 1
        sd[k] = torch.randn(v.shape, generator=g) * (0.5 / math.sqrt(fan_in))
    tm.load_state_dict(sd)
    for m in tm.modules():
        m.eval()

    sd_np = {"module.encoder." + k[8:] if k.startswith("encoder.")
             else "module." + k: v.numpy() for k, v in tm.state_dict().items()}
    params, batch_stats = torch_ast_state_dict_to_tree(sd_np)

    cfg = load_config("config/ast.yaml")
    # parity vs f32 torch needs f32 numerics (the shipped config's
    # production default is bfloat16)
    cfg["compute_dtype"] = "float32"
    model = build_model(cfg)
    spec = rng.randn(2, 64, 100).astype(np.float32)
    template = model.init({"params": jax.random.key(0)},
                          jnp.asarray(spec), False)
    from grafp_tpu.train.checkpoint import verify_tree_shapes

    verify_tree_shapes(params, template["params"], "ast params")

    with torch.no_grad():
        th, tz = tm.fwd(torch.tensor(spec))
    jh, jz = model.apply({"params": params, "batch_stats": batch_stats},
                         jnp.asarray(spec), False)
    np.testing.assert_allclose(np.asarray(jh), th.numpy(), rtol=2e-3, atol=2e-3)
    cos = (np.asarray(jz) * tz.numpy()).sum(-1)
    assert (cos > 0.9999).all(), cos
