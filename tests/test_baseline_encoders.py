import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grafp_tpu.core.config import Config, load_config
from grafp_tpu.models.ast import ASTEncoder
from grafp_tpu.models.nafp import NAFPEncoder
from grafp_tpu.models.simclr import build_model


def test_ast_encoder_shapes(rng):
    x = jnp.asarray(rng.randn(2, 64, 100).astype(np.float32))
    enc = ASTEncoder()
    v = enc.init({"params": jax.random.key(0)}, x)
    out = enc.apply(v, x)
    assert out.shape == (2, 1024)
    assert np.isfinite(np.asarray(out)).all()


def test_ast_param_count():
    """Analytic parity with the reference ASTEncoder (ast_encoder.py:
    335-379, embed 640, depth 8, heads 10):
      patch conv: 640*640 + 640            = 410,240
      cls + pos: 640 + 11*640              = 7,680
      per block: qkv 640*1920+1920, proj 640*640+640, 2 LN 4*640,
                 mlp 640*2560+2560 + 2560*640 + 640 = 4,925,440
      final LN 1280 + head 640*1024+1024   = 656,664... computed below.
    """
    x = jnp.zeros((1, 64, 100))
    enc = ASTEncoder()
    v = enc.init({"params": jax.random.key(0)}, x)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
    per_block = (640 * 1920 + 1920) + (640 * 640 + 640) + 2 * 2 * 640 \
        + (640 * 2560 + 2560) + (2560 * 640 + 640)
    expect = (640 * 640 + 640) + 640 + 11 * 640 + 8 * per_block \
        + 2 * 640 + (640 * 1024 + 1024)
    assert n == expect


def test_ast_rejects_wrong_geometry(rng):
    x = jnp.asarray(rng.randn(1, 64, 32).astype(np.float32))
    enc = ASTEncoder()
    with pytest.raises(AssertionError, match="doesn't match model"):
        enc.init({"params": jax.random.key(0)}, x)


def test_nafp_encoder_shapes(rng):
    x = jnp.asarray(rng.randn(2, 256, 32).astype(np.float32))
    enc = NAFPEncoder()
    v = enc.init({"params": jax.random.key(0)}, x)
    out = enc.apply(v, x)
    assert out.shape == (2, 1024)  # spatial collapses to 1x1x1024
    assert np.isfinite(np.asarray(out)).all()


def test_build_model_ast_from_reference_yaml():
    cfg = load_config("config/ast.yaml")
    model = build_model(cfg)
    x = jnp.zeros((2, cfg.n_mels, cfg.n_frames))
    v = model.init({"params": jax.random.key(0)}, x, False)
    h, z = model.apply(v, x, False)
    assert h.shape == (2, 1024) and z.shape == (2, 128)


def test_baseline_test_fp_preset_resolution(monkeypatch, tmp_path):
    """baselines/test_fp.py resolves tc9-tc12 presets into a materialized
    config and defaults to the AST encoder (reference
    baselines/test_fp.py:186-197)."""
    import importlib.util
    import os
    import sys

    repo = os.path.join(os.path.dirname(__file__), "..")
    spec = importlib.util.spec_from_file_location(
        "baseline_test_fp", os.path.join(repo, "baselines", "test_fp.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    seen = {}
    monkeypatch.setattr(mod.tfm, "main", lambda argv: seen.update(argv=argv))
    monkeypatch.chdir(repo)
    mod.main(["--model", "tc10"])

    argv = seen["argv"]
    assert argv[argv.index("--encoder") + 1] == "ast"
    cfg_path = argv[argv.index("--config") + 1]
    from grafp_tpu.core.config import load_config

    cfg = load_config(cfg_path)
    assert (cfg["offset"], cfg["overlap"]) == (0.05, 0.9)
    os.remove(cfg_path)
