"""Torch-checkpoint import parity.

Builds an independent torch replica of the reference architecture
(same state_dict key schema as chymaera96/GraFP's SimCLR(GraphEncoder);
the reference itself is not importable here - it needs timm), randomizes
ALL weights and BN running stats, imports the state_dict through
grafp_tpu's converter, and requires the jax forward to match the torch
forward. This is the end-to-end guarantee behind loading
model_tc_29_best.pth.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from grafp_tpu.core.config import Config  # noqa: E402
from grafp_tpu.models import build_model  # noqa: E402
from grafp_tpu.train.checkpoint import (  # noqa: E402
    torch_state_dict_to_tree,
    verify_tree_shapes,
)

K = 3


class _TGrapher(nn.Module):
    """Reference Grapher semantics (torch_vertex.py:142-194) with
    reference-compatible child names."""

    def __init__(self, c):
        super().__init__()
        self.fc1 = nn.Sequential(nn.Conv2d(c, c, 1), nn.BatchNorm2d(c))
        gconv = nn.Module()
        gconv.nn = nn.Sequential(
            nn.Conv2d(2 * c, 2 * c, 1, groups=4), nn.BatchNorm2d(2 * c), nn.ReLU()
        )
        self.graph_conv = nn.Module()
        self.graph_conv.gconv = gconv
        self.fc2 = nn.Sequential(nn.Conv2d(2 * c, c, 1), nn.BatchNorm2d(c))

    def forward(self, x):  # x (B, C, N, 1)
        sc = x
        x = self.fc1(x)
        b, c, n, _ = x.shape
        xn = F.normalize(x.squeeze(-1), p=2.0, dim=1).transpose(1, 2)  # (B,N,C)
        d = (
            (xn ** 2).sum(-1, keepdim=True)
            - 2 * xn @ xn.transpose(1, 2)
            + (xn ** 2).sum(-1).unsqueeze(1)
        )
        idx = torch.topk(-d, K).indices                                 # (B,N,K)
        feat = x.squeeze(-1).transpose(1, 2)                            # (B,N,C)
        nbr = torch.gather(
            feat.unsqueeze(2).expand(b, n, K, c),
            1,
            idx.unsqueeze(-1).expand(b, n, K, c),
        )
        rel = nbr.max(dim=2).values - feat                              # (B,N,C)
        inter = torch.stack([feat, rel], dim=-1).reshape(b, n, 2 * c)
        y = inter.transpose(1, 2).unsqueeze(-1)                         # (B,2C,N,1)
        y = self.graph_conv.gconv.nn(y)
        y = self.fc2(y)
        return y + sc


class _TFFN(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.fc1 = nn.Sequential(
            nn.Conv2d(c, 4 * c, 1, bias=False), nn.BatchNorm2d(4 * c)
        )
        self.fc2 = nn.Sequential(
            nn.Conv2d(4 * c, c, 1, bias=False), nn.BatchNorm2d(c)
        )

    def forward(self, x):
        return self.fc2(F.relu(self.fc1(x))) + x


class _TDown(nn.Module):
    def __init__(self, ci, co):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv2d(ci, co, 3, stride=2, padding=1), nn.BatchNorm2d(co)
        )

    def forward(self, x):
        return self.conv(x)


def _build_torch_model():
    blocks, chans = (2, 2, 6, 2), (64, 128, 256, 512)
    model = nn.Module()
    pe = nn.Module()
    pe.convs = nn.Sequential(
        nn.Conv2d(3, 8, (7, 7), stride=(2, 1), padding=(3, 3)), nn.ReLU()
    )
    model.peak_extractor = pe
    enc = nn.Module()
    enc.stem = nn.Sequential(
        nn.Conv2d(8, 64, 1, bias=False), nn.BatchNorm2d(64),
        nn.LeakyReLU(0.2),
    )
    seq = []
    for i, (nb, c) in enumerate(zip(blocks, chans)):
        if i > 0:
            seq.append(_TDown(chans[i - 1], c))
        for _ in range(nb):
            seq.append(nn.Sequential(_TGrapher(c), _TFFN(c)))
    enc.backbone = nn.Sequential(*seq)
    enc.proj = nn.Conv2d(512, 1024, 1)
    model.encoder = enc
    model.projector = nn.Sequential(
        nn.Linear(1024, 4096), nn.ELU(), nn.Linear(4096, 128)
    )

    def forward(spec):  # (B, 64, 32)
        mn = spec.amin(dim=(1, 2), keepdim=True)
        mx = spec.amax(dim=(1, 2), keepdim=True)
        s = (spec - mn) / torch.clamp(mx - mn, min=1e-8)
        b, h, w = spec.shape
        t = torch.linspace(0, 1, w).view(1, 1, w).expand(b, h, w)
        f = torch.linspace(0, 1, h).view(1, h, 1).expand(b, h, w)
        x = torch.stack([t, f, s], dim=1)                 # (B,3,64,32)
        x = model.peak_extractor.convs(x)                 # (B,8,32,32)
        x = x.reshape(b, 8, -1).unsqueeze(-1)             # (B,8,1024,1)
        x = enc.stem(x)
        x = enc.backbone(x)
        x = enc.proj(x)
        hvec = x.mean(dim=2).squeeze(-1)
        z = model.projector(hvec)
        return hvec, F.normalize(z, p=2.0, dim=-1)

    model.fwd = forward
    return model


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            if "running_var" in k:
                sd[k] = 0.5 + torch.rand(v.shape, generator=g)
            elif "running_mean" in k:
                sd[k] = 0.2 * torch.randn(v.shape, generator=g)
            elif k.endswith("weight") and v.ndim >= 2:
                fan_in = v[0].numel()
                sd[k] = torch.randn(v.shape, generator=g) * (1.0 / math.sqrt(fan_in))
            else:
                sd[k] = 0.1 * torch.randn(v.shape, generator=g)
    model.load_state_dict(sd)


def test_torch_import_forward_parity(rng):
    tm = _build_torch_model()
    _randomize(tm)
    tm_modules = [m for m in tm.modules()]
    for m in tm_modules:
        m.eval()

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    # simulate DataParallel prefix + dead relative_pos keys
    sd = {"module." + k: v for k, v in sd.items()}
    sd["module.encoder.backbone.0.0.relative_pos"] = np.zeros((1, 4, 4), np.float32)

    params, batch_stats = torch_state_dict_to_tree(sd)

    cfg = Config()
    model = build_model(cfg)
    spec = np.random.RandomState(1).randn(2, 64, 32).astype(np.float32)
    template = model.init({"params": jax.random.key(0)},
                          jnp.asarray(spec), False)
    verify_tree_shapes(params, template["params"], "params")
    verify_tree_shapes(batch_stats, template["batch_stats"], "batch_stats")

    with torch.no_grad():
        th, tz = tm.fwd(torch.tensor(spec))
    jh, jz = model.apply(
        {"params": params, "batch_stats": batch_stats}, jnp.asarray(spec), False
    )
    np.testing.assert_allclose(np.asarray(jh), th.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(jz), tz.numpy(), rtol=2e-3, atol=2e-3)
    # fingerprints must agree to high cosine similarity
    cos = (np.asarray(jz) * tz.numpy()).sum(-1)
    assert (cos > 0.9999).all(), cos
