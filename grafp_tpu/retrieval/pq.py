"""Product quantization codec (FAISS IVFPQ role: code_sz=64 subspaces x
8-bit codes for d=128 fingerprints, reference eval.py:65-69).

TPU-native search strategy: instead of per-query LUT gathers (the CPU ADC
loop), candidate codes are DECOMPRESSED blockwise - one gather from the
(S, 256, dsub) codebooks - and scored with an exact distance matmul on
the MXU. Mathematically identical to asymmetric ADC (both compute
||q - reconstruction||^2); the arithmetic moves from scattered lookups to
a dense matmul, which is the right trade on this hardware.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from grafp_tpu.retrieval.kmeans import kmeans_multi


class ProductQuantizer:
    """d-dim vectors -> (n_sub) uint8 codes. ksub=256 (nbits=8)."""

    def __init__(self, d: int, n_sub: int = 64, ksub: int = 256):
        assert d % n_sub == 0, (d, n_sub)
        self.d = d
        self.n_sub = n_sub
        self.dsub = d // n_sub
        self.ksub = ksub
        self.codebooks = None  # (n_sub, ksub, dsub)

    def train(self, key: jax.Array, data: jnp.ndarray, iters: int = 20) -> None:
        m = data.shape[0]
        sub = data.reshape(m, self.n_sub, self.dsub).transpose(1, 0, 2)
        self.codebooks = kmeans_multi(key, sub, self.ksub, iters)

    def encode(self, data: jnp.ndarray, chunk: int = 1 << 19) -> jnp.ndarray:
        """(M, d) -> (M, n_sub) uint8 (ksub<=256). Chunked: the (M,
        n_sub, ksub) score tensor would be ~0.5 TB for a 7M-row DB."""
        m = data.shape[0]
        if m > chunk:
            parts = [self.encode(data[i:i + chunk]) for i in range(0, m, chunk)]
            return jnp.concatenate(parts)
        sub = data.reshape(m, self.n_sub, self.dsub)
        # scores: (M, n_sub, ksub)
        score = jnp.einsum("msd,skd->msk", sub, self.codebooks,
                           preferred_element_type=jnp.float32)
        score = score - 0.5 * jnp.sum(self.codebooks ** 2, axis=-1)[None]
        return jnp.argmax(score, axis=-1).astype(jnp.uint8)

    def decode(self, codes: jnp.ndarray) -> jnp.ndarray:
        """(M, n_sub) uint8 -> (M, d) reconstructions."""
        m = codes.shape[0]
        # gather codebooks[s, codes[m, s]] -> (M, n_sub, dsub)
        rec = jnp.take_along_axis(
            self.codebooks[None],                       # (1, S, ksub, dsub)
            codes.astype(jnp.int32)[..., None, None],   # (M, S, 1, 1)
            axis=2,
        )[:, :, 0, :]
        return rec.reshape(m, self.d)

    def state(self):
        return {"codebooks": self.codebooks, "d": self.d,
                "n_sub": self.n_sub, "ksub": self.ksub}

    @staticmethod
    def from_state(st) -> "ProductQuantizer":
        pq = ProductQuantizer(int(st["d"]), int(st["n_sub"]), int(st["ksub"]))
        pq.codebooks = st["codebooks"]
        return pq
