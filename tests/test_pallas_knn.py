"""Pallas fused knn-maxrel kernel vs the exact reference formulation
(interpret mode on CPU; the TPU-compiled path is validated on-device by
scripts/profile_pallas_knn.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from grafp_tpu.ops.mrconv_neighbors import max_neighbors_onehot
from grafp_tpu.ops.pallas_knn import max_neighbors_pallas


def test_pallas_matches_exact(rng):
    for (b, n, c, k) in ((2, 64, 16, 3), (1, 32, 8, 5)):
        x = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
        p = np.asarray(max_neighbors_pallas(x, k, True))
        o = np.asarray(max_neighbors_onehot(x, k))
        np.testing.assert_allclose(p, o, rtol=1e-5, atol=1e-6)


def test_pallas_gradient_matches_onehot(rng):
    x = jnp.asarray(rng.randn(1, 24, 8).astype(np.float32))

    def fp(xx):
        return jnp.sum(max_neighbors_pallas(xx, 3, True) ** 2)

    def fo(xx):
        return jnp.sum(max_neighbors_onehot(xx, 3) ** 2)

    g1 = np.asarray(jax.grad(fp)(x))
    g2 = np.asarray(jax.grad(fo)(x))
    np.testing.assert_allclose(g1, g2, rtol=1e-5, atol=1e-6)


def test_pallas_duplicate_nodes_tie_handling(rng):
    """Identical feature rows tie in similarity; the mean-of-tied
    extraction must still return that exact feature."""
    row = rng.randn(8).astype(np.float32)
    x = np.stack([row] * 5 + [rng.randn(8).astype(np.float32) for _ in range(3)])
    xj = jnp.asarray(x[None])
    p = np.asarray(max_neighbors_pallas(xj, 3, True))[0]
    # for the duplicated rows, the k nearest are the duplicates themselves
    for i in range(5):
        np.testing.assert_allclose(p[i], row, rtol=1e-5, atol=1e-6)


def test_grapher_with_pallas_strategy(rng):
    from grafp_tpu.models.gnn import Grapher

    x = jnp.asarray(rng.randn(2, 32, 8).astype(np.float32))
    g_p = Grapher(features=8, k=3, knn_strategy="pallas")
    g_o = Grapher(features=8, k=3, knn_strategy="onehot")
    v = g_p.init(jax.random.key(0), x, False)
    out_p = np.asarray(g_p.apply(v, x, False))
    out_o = np.asarray(g_o.apply(v, x, False))
    np.testing.assert_allclose(out_p, out_o, rtol=1e-4, atol=1e-5)


def test_pallas_gradient_multi_tile_accumulation(rng, monkeypatch):
    """The backward kernel accumulates the (N, C) cotangent across query
    tiles (grid j); shrink the tile cap so n=32 spans 4 tiles."""
    import grafp_tpu.ops.pallas_knn as pk

    monkeypatch.setattr(pk, "_MAX_TILE_F32", 8)
    monkeypatch.setattr(pk, "_MAX_TILE_BF16", 8)
    x = jnp.asarray(rng.randn(2, 32, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(2, 32, 8).astype(np.float32))

    g1 = np.asarray(jax.grad(
        lambda xx: jnp.sum(max_neighbors_pallas(xx, 3, True) * w))(x))
    g2 = np.asarray(jax.grad(
        lambda xx: jnp.sum(max_neighbors_onehot(xx, 3) * w))(x))
    np.testing.assert_allclose(g1, g2, rtol=1e-5, atol=1e-6)


def test_pallas_gradient_bf16_cotangent(rng):
    """Training runs the model in bf16: the VJP must accept bf16 x and
    return a bf16 cotangent without dtype errors."""
    x = jnp.asarray(rng.randn(1, 16, 8).astype(np.float32)).astype(jnp.bfloat16)
    g = jax.grad(
        lambda xx: jnp.sum(max_neighbors_pallas(xx, 3, True).astype(jnp.float32))
    )(x)
    assert g.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(g, np.float32)).all()


def test_bf16_backward_close_to_f32(rng):
    """The backward's bf16 cast of the cotangent (g/cnt) is a deliberate
    precision trade (ops/pallas_knn.py:_one_backward) - unlike the
    forward's bit-exact 0/1-mask argument, arbitrary gradient values ARE
    quantized. Bound the deviation against the f32 reference on
    bf16-representable inputs (so selection is identical and the only
    difference is the backward's quantization)."""
    from grafp_tpu.ops.mrconv_neighbors import max_neighbors_onehot

    b, n, c, k = 2, 24, 8, 3
    x16 = jnp.asarray(rng.randn(b, n, c).astype(np.float32)).astype(jnp.bfloat16)
    x32 = x16.astype(jnp.float32)                 # exactly representable
    w16 = jnp.asarray(rng.randn(b, n, c).astype(np.float32)).astype(jnp.bfloat16)
    w32 = w16.astype(jnp.float32)

    g16 = jax.grad(lambda xx: jnp.sum(
        (max_neighbors_pallas(xx, k, True) * w16).astype(jnp.float32)))(x16)
    g32 = jax.grad(lambda xx: jnp.sum(
        max_neighbors_onehot(xx, k) * w32))(x32)

    g16 = np.asarray(g16, np.float32)
    g32 = np.asarray(g32)
    scale = np.abs(g32).max()
    assert scale > 0
    # bf16 keeps 8 mantissa bits (~0.4% per element); f32 accumulation
    # keeps the matmul from compounding it
    np.testing.assert_allclose(g16, g32, rtol=0, atol=0.02 * scale)


def test_n_ge_k_precondition(rng):
    """N < k is refused at the static-shape wrappers (ADVICE r2: the
    thresholded selection would silently inject 0 into the running max
    where the classic formulation re-selects every column)."""
    import pytest

    from grafp_tpu.ops.pallas_knn import mrconv_concat_pallas

    x = jnp.asarray(rng.randn(1, 2, 8).astype(np.float32))
    with pytest.raises(AssertionError, match="N >= k"):
        max_neighbors_pallas(x, 3, True)
    with pytest.raises(AssertionError, match="N >= k"):
        mrconv_concat_pallas(x, 3, True)


def test_mrconv_concat_matches_separate_paths(rng):
    """The fused [x || rel - x] kernel must equal the standalone kernel's
    rel minus x, concat layout, for f32 (bit-exact selection) inputs."""
    from grafp_tpu.ops.pallas_knn import mrconv_concat_pallas

    for (b, n, c, k) in ((2, 32, 8, 3), (3, 16, 4, 2)):
        x = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
        y = np.asarray(mrconv_concat_pallas(x, k, True))
        rel = np.asarray(max_neighbors_pallas(x, k, True))
        np.testing.assert_allclose(y[..., :c], np.asarray(x), rtol=0, atol=0)
        np.testing.assert_allclose(y[..., c:], rel - np.asarray(x),
                                   rtol=1e-5, atol=1e-6)


def test_mrconv_concat_gradient_matches_onehot(rng):
    """d/dx of sum(w * [x || rel-x]) via the fused kernel's VJP must match
    the XLA onehot formulation of the same function."""
    from grafp_tpu.ops.pallas_knn import mrconv_concat_pallas

    b, n, c, k = 2, 24, 8, 3
    x = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    w = jnp.asarray(rng.randn(b, n, 2 * c).astype(np.float32))

    def via_kernel(xx):
        return jnp.sum(mrconv_concat_pallas(xx, k, True) * w)

    def via_onehot(xx):
        rel = max_neighbors_onehot(xx, k)
        return jnp.sum(jnp.concatenate([xx, rel - xx], axis=-1) * w)

    g1 = np.asarray(jax.grad(via_kernel)(x))
    g2 = np.asarray(jax.grad(via_onehot)(x))
    np.testing.assert_allclose(g1, g2, rtol=1e-5, atol=1e-6)


def test_mrconv_concat_multi_tile(rng, monkeypatch):
    """Row-tiled path (t < n): outputs per tile and the backward's
    direct-term scatter into the revisited output block."""
    import grafp_tpu.ops.pallas_knn as pk

    monkeypatch.setattr(pk, "_MAX_TILE_F32", 8)
    monkeypatch.setattr(pk, "_MAX_TILE_BF16", 8)
    x = jnp.asarray(rng.randn(2, 32, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(2, 32, 16).astype(np.float32))
    y = np.asarray(pk.mrconv_concat_pallas(x, 3, True))
    rel = np.asarray(max_neighbors_pallas(x, 3, True))
    np.testing.assert_allclose(y[..., 8:], rel - np.asarray(x),
                               rtol=1e-5, atol=1e-6)
    g1 = np.asarray(jax.grad(
        lambda xx: jnp.sum(pk.mrconv_concat_pallas(xx, 3, True) * w))(x))
    g2 = np.asarray(jax.grad(lambda xx: jnp.sum(jnp.concatenate(
        [xx, max_neighbors_onehot(xx, 3) - xx], -1) * w))(x))
    np.testing.assert_allclose(g1, g2, rtol=1e-5, atol=1e-6)


def test_grouped_as_concat_dense_equivalence(rng):
    """Dense permuted-block-diag weight on concat input == grouped conv
    on interleaved input (exact: same dot order per group block row)."""
    from grafp_tpu.models.layers import GroupedPointwiseConv

    a = jnp.asarray(rng.randn(2, 10, 16).astype(np.float32))
    b_ = jnp.asarray(rng.randn(2, 10, 16).astype(np.float32))
    inter = jnp.stack([a, b_], axis=-1).reshape(2, 10, 32)
    concat = jnp.concatenate([a, b_], axis=-1)

    gc = GroupedPointwiseConv(32)
    v = gc.init(jax.random.key(0), inter)
    y_ref = np.asarray(gc.apply(v, inter))
    gc2 = GroupedPointwiseConv(32, concat_interleaved=True)
    y_new = np.asarray(gc2.apply(v, concat))
    np.testing.assert_allclose(y_new, y_ref, rtol=1e-5, atol=1e-6)
