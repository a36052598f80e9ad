"""Whole-Grapher serving kernel (ops/pallas_knn.py:grapher_block_pallas).

The fused path must declare the exact same param/variable tree as the
unfused path (checkpoints load unchanged, init is path-independent) and
reproduce the unfused eval forward numerically — including with
non-trivial BatchNorm running statistics, since the kernel consumes
BN-folded weights. Runs in pallas interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grafp_tpu.models.gnn import Grapher, GraphEncoder


def _perturb_stats(variables, rng):
    """Random non-trivial running stats so BN folding is actually load-
    bearing in the comparison."""
    def f(path, v):
        name = path[-1].key
        if name == "mean":
            return jnp.asarray(rng.normal(size=v.shape, scale=0.3), v.dtype)
        if name == "var":
            return jnp.asarray(rng.uniform(0.5, 2.0, size=v.shape), v.dtype)
        return v

    return jax.tree_util.tree_map_with_path(f, variables)


@pytest.mark.parametrize("n,c", [(16, 8), (64, 16)])
def test_fused_grapher_matches_unfused_eval(n, c, rng):
    x = jnp.asarray(rng.randn(2, n, c).astype(np.float32))
    fused = Grapher(c, k=3, knn_strategy="pallas", fuse_serving="on")
    unfused = Grapher(c, k=3, knn_strategy="onehot")

    vf = fused.init({"params": jax.random.key(0)}, x, False)
    vu = unfused.init({"params": jax.random.key(0)}, x, False)
    assert (jax.tree_util.tree_structure(vf) ==
            jax.tree_util.tree_structure(vu))
    for a, b in zip(jax.tree_util.tree_leaves(vf),
                    jax.tree_util.tree_leaves(vu)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    vf = _perturb_stats(vf, np.random.default_rng(1))
    yf = fused.apply(vf, x, False)
    yu = unfused.apply(vf, x, False)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yu),
                               rtol=1e-4, atol=1e-4)


def test_fused_grapher_tree_matches_train_init(rng):
    """init through the TRAIN path (unfused) and the EVAL path (fused)
    must agree - resume/checkpoint flows hit both."""
    x = jnp.asarray(rng.randn(2, 16, 8).astype(np.float32))
    g = Grapher(8, k=3, knn_strategy="pallas", fuse_serving="on")
    v_eval = g.init({"params": jax.random.key(0)}, x, False)
    v_train = g.init({"params": jax.random.key(0)}, x, True)
    assert (jax.tree_util.tree_structure(v_eval) ==
            jax.tree_util.tree_structure(v_train))
    for a, b in zip(jax.tree_util.tree_leaves(v_eval),
                    jax.tree_util.tree_leaves(v_train)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_full_encoder_matches_unfused(rng):
    """Stacked blocks + downsamples: the fused eval forward of the full
    tiny pyramid tracks the onehot eval forward."""
    x = jnp.asarray(rng.randn(2, 64, 8).astype(np.float32))
    kw = dict(size="t", k=3, emb_dims=32)
    fused = GraphEncoder(knn_strategy="pallas", fuse_serving="on", **kw)
    unfused = GraphEncoder(knn_strategy="onehot", **kw)
    v = fused.init({"params": jax.random.key(0)}, x, False)
    v = _perturb_stats(v, np.random.default_rng(2))
    yf = np.asarray(fused.apply(v, x, False))
    yu = np.asarray(unfused.apply(v, x, False))
    np.testing.assert_allclose(yf, yu, rtol=2e-3, atol=2e-3)
    cos = (yf * yu).sum() / (np.linalg.norm(yf) * np.linalg.norm(yu))
    assert cos > 0.9999


def test_fused_grapher_not_used_in_train_mode(rng):
    """Gradients must flow in train mode (the fused kernel has no VJP);
    a successful grad through the pallas strategy proves the train path
    stayed on the custom-VJP frontend kernel."""
    x = jnp.asarray(rng.randn(2, 16, 8).astype(np.float32))
    g = Grapher(8, k=3, knn_strategy="pallas")
    v = g.init({"params": jax.random.key(0)}, x, True)

    def loss(params):
        y, _ = g.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x, True,
            mutable=["batch_stats"])
        return jnp.sum(y * y)

    grads = jax.grad(loss)(v["params"])
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(grads))


def test_grapher_block_supported_vmem_guard():
    """ADVICE r3: shapes whose estimated working set exceeds the
    calibrated VMEM envelope report unsupported (graceful fallback)
    instead of failing at Mosaic compile time; every flagship stage
    shape stays supported."""
    import jax.numpy as jnp

    from grafp_tpu.ops.pallas_knn import grapher_block_supported

    # flagship 't' stages (N, C): all measured-good
    for n, c in [(1024, 64), (512, 128), (256, 256), (128, 512)]:
        assert grapher_block_supported(n, c, jnp.bfloat16, k=3), (n, c)
    # a C=1024 stem estimates ~32 MB — over the envelope
    assert not grapher_block_supported(128, 1024, jnp.bfloat16, k=3)
    # a very large k inflates the per-item estimate past the envelope too
    assert not grapher_block_supported(1024, 64, jnp.bfloat16, k=16)
