"""The three neighbor-max strategies must agree (onehot/exact identical;
approx with high recall on well-separated data)."""

import jax.numpy as jnp
import numpy as np

from grafp_tpu.ops.mrconv_neighbors import (
    max_neighbors_approx,
    max_neighbors_exact,
    max_neighbors_onehot,
    max_relative_neighbors,
)


def test_onehot_equals_exact(rng):
    for (b, n, c, k) in ((2, 40, 16, 3), (1, 64, 8, 5), (3, 17, 4, 2)):
        x = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
        e = np.asarray(max_neighbors_exact(x, k))
        o = np.asarray(max_neighbors_onehot(x, k))
        np.testing.assert_allclose(o, e, rtol=1e-5, atol=1e-6)


def test_approx_close_to_exact(rng):
    x = jnp.asarray(rng.randn(2, 128, 16).astype(np.float32))
    e = np.asarray(max_neighbors_exact(x, 3))
    a = np.asarray(max_neighbors_approx(x, 3))
    # approx_max_k recall ~0.95: most rows identical
    frac_equal = np.mean(np.all(np.isclose(a, e, atol=1e-6), axis=-1))
    assert frac_equal > 0.8


def test_strategy_dispatch(rng):
    x = jnp.asarray(rng.randn(1, 16, 4).astype(np.float32))
    for s in ("exact", "approx", "onehot"):
        out = max_relative_neighbors(x, 2, strategy=s)
        assert out.shape == x.shape
