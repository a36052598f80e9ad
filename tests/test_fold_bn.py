import jax
import jax.numpy as jnp
import numpy as np

from grafp_tpu.core.config import Config
from grafp_tpu.models import build_model
from grafp_tpu.models.fold_bn import fold_batch_norms, neutral_batch_stats


def test_folded_params_reproduce_forward(rng):
    cfg = Config()
    model = build_model(cfg)
    spec = jnp.asarray(rng.randn(2, 64, 32).astype(np.float32))
    v = model.init({"params": jax.random.key(0)}, spec, False)
    # make BN stats non-trivial so folding is actually exercised
    stats = jax.tree.map(
        lambda x: jnp.asarray(
            0.5 + 0.5 * np.abs(np.random.RandomState(0).randn(*x.shape)),
            jnp.float32,
        ),
        v["batch_stats"],
    )
    ref_h, ref_z = model.apply({"params": v["params"], "batch_stats": stats},
                               spec, False)
    folded = fold_batch_norms(v["params"], stats)
    neutral = neutral_batch_stats(stats)
    h, z = model.apply({"params": folded, "batch_stats": neutral}, spec, False)
    np.testing.assert_allclose(np.asarray(h), np.asarray(ref_h),
                               rtol=2e-3, atol=2e-3)
    cos = (np.asarray(z) * np.asarray(ref_z)).sum(-1)
    assert (cos > 0.9999).all()
