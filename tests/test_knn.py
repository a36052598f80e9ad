import jax.numpy as jnp
import numpy as np

from grafp_tpu.ops.knn import (
    dilate_neighbors,
    gather_neighbors,
    knn_graph,
    l2_normalize,
    pairwise_sqdist,
)


def _np_knn(x, k):
    """Reference-spec kNN in numpy: channel-normalize, sq-L2, top-k of
    -dist (self included), nearest first (torch_edge.py:70-103)."""
    xn = x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    d = (
        (xn ** 2).sum(-1)[:, :, None]
        - 2 * np.einsum("bnc,bmc->bnm", xn, xn)
        + (xn ** 2).sum(-1)[:, None, :]
    )
    return np.argsort(d, axis=-1, kind="stable")[:, :, :k]


def test_knn_matches_numpy(rng):
    x = rng.randn(2, 50, 16).astype(np.float32)
    idx = np.asarray(knn_graph(jnp.asarray(x), 5))
    ref = _np_knn(x, 5)
    # distances may tie at float precision; compare via distances not ids
    xn = x / np.linalg.norm(x, axis=-1, keepdims=True)
    for b in range(2):
        for n in range(50):
            got_d = np.sort(
                ((xn[b, idx[b, n]] - xn[b, n]) ** 2).sum(-1)
            )
            ref_d = np.sort(((xn[b, ref[b, n]] - xn[b, n]) ** 2).sum(-1))
            np.testing.assert_allclose(got_d, ref_d, atol=1e-5)


def test_knn_self_is_first(rng):
    x = rng.randn(1, 20, 8).astype(np.float32)
    idx = np.asarray(knn_graph(jnp.asarray(x), 3))
    np.testing.assert_array_equal(idx[0, :, 0], np.arange(20))


def test_blockwise_equals_dense(rng):
    x = jnp.asarray(rng.randn(2, 64, 8).astype(np.float32))
    a = np.asarray(knn_graph(x, 4, block_rows=0))
    b = np.asarray(knn_graph(x, 4, block_rows=16))
    c = np.asarray(knn_graph(x, 4, block_rows=20))  # non-dividing block
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, c)


def test_dilate_neighbors():
    idx = jnp.arange(12).reshape(1, 1, 12)
    np.testing.assert_array_equal(
        np.asarray(dilate_neighbors(idx, 3))[0, 0], [0, 3, 6, 9]
    )
    np.testing.assert_array_equal(
        np.asarray(dilate_neighbors(idx, 1))[0, 0], np.arange(12)
    )


def test_gather_neighbors(rng):
    x = jnp.asarray(rng.randn(2, 10, 4).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 10, size=(2, 10, 3)))
    out = np.asarray(gather_neighbors(x, idx))
    for b in range(2):
        for n in range(10):
            for j in range(3):
                np.testing.assert_array_equal(
                    out[b, n, j], np.asarray(x)[b, int(idx[b, n, j])]
                )


def test_pairwise_sqdist(rng):
    x = rng.randn(1, 8, 4).astype(np.float32)
    y = rng.randn(1, 6, 4).astype(np.float32)
    d = np.asarray(pairwise_sqdist(jnp.asarray(x), jnp.asarray(y)))
    ref = ((x[:, :, None] - y[:, None]) ** 2).sum(-1)
    np.testing.assert_allclose(d, ref, atol=1e-5)


def test_l2_normalize_zero_safe():
    x = jnp.zeros((2, 3))
    out = np.asarray(l2_normalize(x))
    assert np.isfinite(out).all()
