"""int8-dynamic serving path (models/layers.py:int8_dynamic_matmul).

The quantized path must (a) leave the param tree bit-identical to the
full-precision model so trained checkpoints load unchanged, (b) track
the f32 forward closely enough that fingerprint ranking is preserved,
and (c) be rejected by the training entry points (round() has zero
gradient). Throughput is measured on-chip (BASELINE.md), not here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grafp_tpu.core.config import Config
from grafp_tpu.models.layers import (
    GroupedPointwiseConv,
    PointwiseConv,
    _grouped_as_blockdiag_dense,
    int8_dynamic_matmul,
)
from grafp_tpu.models.simclr import build_model


def test_int8_matmul_matches_manual_dequant():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(5, 7, 16)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(16, 24)), jnp.float32)
    y = int8_dynamic_matmul(x, w)

    sw = np.maximum(np.abs(np.asarray(w)).max(axis=0, keepdims=True), 1e-8) / 127.0
    qw = np.round(np.asarray(w) / sw)
    sx = max(np.abs(np.asarray(x)).max(), 1e-8) / 127.0
    qx = np.clip(np.round(np.asarray(x) / sx), -127, 127)
    ref = np.einsum("bni,io->bno", qx, qw) * (sx * sw)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=0, atol=1e-4)
    # and it tracks the unquantized product
    full = np.einsum("bni,io->bno", np.asarray(x), np.asarray(w))
    cos = (ref * full).sum() / (np.linalg.norm(ref) * np.linalg.norm(full))
    assert cos > 0.999


def test_grouped_blockdiag_dense_equivalence():
    rng = np.random.default_rng(1)
    g, cig, cog = 4, 8, 6
    w = jnp.asarray(rng.normal(size=(g, cig, cog)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(3, g * cig)), jnp.float32)
    dense = _grouped_as_blockdiag_dense(w, g * cig, g * cog)
    ref = jnp.einsum("bgi,gio->bgo",
                     x.reshape(3, g, cig), w).reshape(3, g * cog)
    np.testing.assert_allclose(np.asarray(x @ dense), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("cls,kw", [
    (PointwiseConv, {}),
    (GroupedPointwiseConv, {}),
    (GroupedPointwiseConv, {"concat_interleaved": True}),
])
def test_quant_layer_param_tree_and_fidelity(cls, kw):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 32, 64)), jnp.float32)
    base = cls(features=32, **kw)
    quant = cls(features=32, quant=True, **kw)
    v0 = base.init(jax.random.key(0), x)
    v1 = quant.init(jax.random.key(0), x)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
    for a, b in zip(jax.tree_util.tree_leaves(v0), jax.tree_util.tree_leaves(v1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    y0 = np.asarray(base.apply(v0, x), np.float32).ravel()
    y1 = np.asarray(quant.apply(v0, x), np.float32).ravel()
    cos = (y0 * y1).sum() / (np.linalg.norm(y0) * np.linalg.norm(y1) + 1e-9)
    assert cos > 0.995, cos


def test_full_model_quant_fingerprint_fidelity():
    cfg = Config()
    base = build_model(cfg)
    cfg_q = Config()
    cfg_q["serve_quant"] = "int8"
    quant = build_model(cfg_q)

    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(4, cfg["n_mels"], cfg["n_frames"])), jnp.float32)
    v = base.init({"params": jax.random.key(0)}, x, False)
    v_q = quant.init({"params": jax.random.key(0)}, x, False)
    assert (jax.tree_util.tree_structure(v) ==
            jax.tree_util.tree_structure(v_q))  # checkpoint-compatible

    _, z = base.apply(v, x, False)
    _, z_q = quant.apply(v, x, False)
    cos = np.sum(np.asarray(z) * np.asarray(z_q), axis=-1)  # both L2-normed
    assert cos.min() > 0.98, cos


def test_quant_rejected_for_training_and_other_archs():
    from grafp_tpu.train.state import create_train_state

    cfg = Config()
    cfg["serve_quant"] = "int8"
    model = build_model(cfg)
    with pytest.raises(ValueError, match="extraction-only"):
        create_train_state(model, cfg, jax.random.key(0))

    cfg["arch"] = "ast"
    with pytest.raises(NotImplementedError):
        build_model(cfg)

    cfg["arch"] = "grafp"
    cfg["serve_quant"] = "int4"
    with pytest.raises(ValueError, match="serve_quant"):
        build_model(cfg)


def test_int8_static_calibrate_and_serve():
    """VERDICT r3 #7 plumbing: one 'int8_calibrate' pass records
    per-layer activation maxima; 'int8_static' serves from them with NO
    dynamic max passes."""
    from grafp_tpu.models.simclr import calibrate_act_scales

    cfg = Config()
    x = jnp.asarray(np.random.default_rng(5).normal(
        size=(4, cfg["n_mels"], cfg["n_frames"])), jnp.float32)
    base = build_model(cfg)
    v = base.init({"params": jax.random.key(0)}, x, False)
    params, batch_stats = v["params"], v.get("batch_stats", {})

    scales = calibrate_act_scales(cfg, params, batch_stats, [x])
    leaves = jax.tree.leaves(scales)
    assert leaves and all(float(a) > 0 for a in leaves)

    cfg_s = Config(); cfg_s["serve_quant"] = "int8_static"
    static = build_model(cfg_s)
    _, z_s = static.apply({"params": params, "batch_stats": batch_stats,
                           "act_scales": scales}, x, False)

    cfg_d = Config(); cfg_d["serve_quant"] = "int8"
    dyn = build_model(cfg_d)
    _, z_d = dyn.apply({"params": params, "batch_stats": batch_stats},
                       x, False)
    # On the calibration batch itself static ~= dynamic (not
    # bit-identical: calibration records maxima of EXACT activations,
    # the dynamic path takes maxima of its own quantized activations, so
    # scales differ slightly past layer 1).
    cos_sd = np.sum(np.asarray(z_s) * np.asarray(z_d), axis=-1)
    assert cos_sd.min() > 0.999, cos_sd

    # fidelity vs full precision on a DIFFERENT batch (saturating scales)
    x2 = jnp.asarray(np.random.default_rng(6).normal(
        size=(4, cfg["n_mels"], cfg["n_frames"])), jnp.float32)
    _, z_f = base.apply({"params": params, "batch_stats": batch_stats},
                        x2, False)
    _, z_s2 = static.apply({"params": params, "batch_stats": batch_stats,
                            "act_scales": scales}, x2, False)
    cos = np.sum(np.asarray(z_f) * np.asarray(z_s2), axis=-1)
    assert cos.min() > 0.98, cos


def test_int8_static_through_pipeline_extra_variables():
    """FingerprintPipeline threads the act_scales collection so the DB
    builders can serve int8_static end-to-end."""
    from grafp_tpu.fp.builder import FingerprintPipeline
    from grafp_tpu.models.simclr import calibrate_act_scales

    cfg = Config(fs=1000, win_len=256, hop_len=128, n_fft=256, n_mels=16,
                 n_frames=8)
    base = build_model(cfg)
    x = jnp.asarray(np.random.default_rng(7).normal(
        size=(2, cfg["n_mels"], cfg["n_frames"])), jnp.float32)
    v = base.init({"params": jax.random.key(0)}, x, False)
    params, batch_stats = v["params"], v.get("batch_stats", {})
    scales = calibrate_act_scales(cfg, params, batch_stats, [x])

    cfg_s = Config(fs=1000, win_len=256, hop_len=128, n_fft=256, n_mels=16,
                   n_frames=8)
    cfg_s["serve_quant"] = "int8_static"
    static = build_model(cfg_s)
    pipe = FingerprintPipeline(static, cfg_s, params, batch_stats,
                               extra_variables={"act_scales": scales})
    wave = np.random.default_rng(8).normal(size=4000).astype(np.float32)
    z = pipe.fingerprint_track(wave)
    assert z.shape[1] == cfg["d"] and np.isfinite(z).all()


def test_int8_static_lazy_calibration_in_pipeline():
    """The reference-contract CLIs construct FingerprintPipeline with
    only params/batch_stats; with serve_quant='int8_static' in the YAML
    the pipeline must calibrate transparently on the first data it sees
    (fp/builder.py:_ensure_calibrated) instead of crashing on the
    missing 'act_scales' collection. Lazy scales must match an explicit
    calibrate_act_scales on the same inputs."""
    from grafp_tpu.fp.builder import FingerprintPipeline
    from grafp_tpu.models.simclr import calibrate_act_scales

    cfg = Config(fs=1000, win_len=256, hop_len=128, n_fft=256, n_mels=16,
                 n_frames=8)
    base = build_model(cfg)
    x = jnp.asarray(np.random.default_rng(7).normal(
        size=(2, cfg["n_mels"], cfg["n_frames"])), jnp.float32)
    v = base.init({"params": jax.random.key(0)}, x, False)
    params, batch_stats = v["params"], v.get("batch_stats", {})

    cfg_s = Config(fs=1000, win_len=256, hop_len=128, n_fft=256, n_mels=16,
                   n_frames=8)
    cfg_s["serve_quant"] = "int8_static"
    static = build_model(cfg_s)
    pipe = FingerprintPipeline(static, cfg_s, params, batch_stats)
    assert pipe._needs_calibration
    wave = np.random.default_rng(8).normal(size=4000).astype(np.float32)
    z = pipe.fingerprint_track(wave)
    assert z.shape[1] == cfg["d"] and np.isfinite(z).all()
    assert not pipe._needs_calibration

    # lazy scales == explicit calibration over the same segment batch
    segs = pipe.segments_for(wave)[: pipe.batch_size]
    ref_scales = calibrate_act_scales(cfg, params, batch_stats,
                                      [jnp.asarray(segs)])
    lazy = jax.tree.leaves(pipe.extra_variables["act_scales"])
    ref = jax.tree.leaves(ref_scales)
    assert len(lazy) == len(ref) and len(lazy) > 0
    for a, b in zip(lazy, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)

    # and a second pipeline fed via embed_stream also self-calibrates
    from grafp_tpu.retrieval.memmap_io import MemmapWriter

    import tempfile
    pipe2 = FingerprintPipeline(static, cfg_s, params, batch_stats,
                                batch_size=4)
    with tempfile.TemporaryDirectory() as td:
        w = MemmapWriter(td, "db", pipe2.d, capacity=64)
        n = pipe2.embed_stream([segs[:6]], w)
        w.close()
    assert n == 6 and not pipe2._needs_calibration
