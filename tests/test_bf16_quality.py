"""bf16 serving-path numerics: fingerprints must stay close to f32
(bench.py serves bf16; retrieval ranking depends on cosine geometry)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grafp_tpu.core.config import Config
from grafp_tpu.models import build_model


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="CPU backend lacks bf16 dot support")
def test_bf16_fingerprints_close_to_f32(rng):
    cfg32 = Config(compute_dtype="float32")
    cfg16 = Config(compute_dtype="bfloat16")
    m32 = build_model(cfg32)
    m16 = build_model(cfg16)
    spec = jnp.asarray(rng.randn(4, 64, 32).astype(np.float32))
    v = m32.init({"params": jax.random.key(0)}, spec, False)
    _, z32 = m32.apply(v, spec, False)
    _, z16 = m16.apply(v, spec, False)
    cos = (np.asarray(z32) * np.asarray(z16, np.float32)).sum(-1)
    # bf16 matmul inputs with f32 accumulation through 12 graph blocks
    assert (cos > 0.99).all(), cos
