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


@functools.partial(jax.jit, static_argnames=("n_sub", "ksub"))
def _pq_encode_chunk(data, dense_cb, cb_sq, n_sub, ksub):
    """Encode via ONE dense (m, d) x (d, n_sub*ksub) matmul.

    dense_cb is the block-diagonal codebook matrix (subspace s's
    centroids occupy rows [s*dsub, (s+1)*dsub) and columns
    [s*ksub, (s+1)*ksub)), so column (s, k) of the product is exactly
    sub_s . c_{s,k}. The naive einsum 'msd,skd->msk' contracts over
    dsub (=2 for 64x8 PQ on d=128) - 1/64th of the MXU's 128-deep
    systolic contraction; densifying trades 64x redundant multiplies by
    structural zeros for full MXU utilization (measured 23x faster at
    1M rows, scripts/profile_pq_encode.py).
    """
    m = data.shape[0]
    score = jnp.matmul(data, dense_cb, preferred_element_type=jnp.float32)
    score = score.reshape(m, n_sub, ksub) - 0.5 * cb_sq[None]
    return jnp.argmax(score, axis=-1).astype(jnp.uint8)


class ProductQuantizer:
    """d-dim vectors -> (n_sub) uint8 codes. ksub=256 (nbits=8)."""

    def __init__(self, d: int, n_sub: int = 64, ksub: int = 256):
        assert d % n_sub == 0, (d, n_sub)
        self.d = d
        self.n_sub = n_sub
        self.dsub = d // n_sub
        self.ksub = ksub
        self.codebooks = None  # (n_sub, ksub, dsub)
        self._dense = None     # cached (d, S*K) block-diag encode matrix

    def train(self, key: jax.Array, data: jnp.ndarray, iters: int = 20) -> None:
        m = data.shape[0]
        sub = data.reshape(m, self.n_sub, self.dsub).transpose(1, 0, 2)
        self.codebooks = kmeans_multi(key, sub, self.ksub, iters)
        self._dense = None

    def _dense_codebook(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(d, n_sub*ksub) block-diagonal matrix + (n_sub, ksub) sq-norms,
        built once per train() (see _pq_encode_chunk)."""
        if getattr(self, "_dense", None) is None:
            import numpy as onp

            cb = onp.asarray(self.codebooks)              # (S, K, dsub)
            W = onp.zeros((self.d, self.n_sub * self.ksub), onp.float32)
            for s in range(self.n_sub):
                W[s * self.dsub:(s + 1) * self.dsub,
                  s * self.ksub:(s + 1) * self.ksub] = cb[s].T
            self._dense = (
                jnp.asarray(W),
                jnp.sum(jnp.asarray(cb) ** 2, axis=-1),   # (S, K)
            )
        return self._dense

    def encode(self, data: jnp.ndarray, chunk: int = 1 << 16) -> jnp.ndarray:
        """(M, d) -> (M, n_sub) uint8 (ksub<=256). Scanned in 64k-row
        chunks inside one jit: the full (M, n_sub, ksub) score tensor
        would be ~0.5 TB for a 7M-row DB."""
        m = data.shape[0]
        dense_cb, cb_sq = self._dense_codebook()
        if m <= chunk:
            return _pq_encode_chunk(data, dense_cb, cb_sq, self.n_sub,
                                    self.ksub)
        nblk = -(-m // chunk)
        pad = nblk * chunk - m
        dp = jnp.pad(data, ((0, pad), (0, 0)))
        blocks = dp.reshape(nblk, chunk, -1)
        codes = jax.lax.map(
            lambda b: _pq_encode_chunk(b, dense_cb, cb_sq, self.n_sub,
                                       self.ksub),
            blocks,
        )
        return codes.reshape(nblk * chunk, self.n_sub)[:m]

    def decode(self, codes: jnp.ndarray) -> jnp.ndarray:
        """(M, n_sub) uint8 -> (M, d) reconstructions.

        Gather layout matters on TPU: rows of width dsub(=2) pad to the
        128-lane tile (64x memory blowup; a broadcasted take_along_axis
        is even worse - it materializes the ksub axis). Gathering
        (dsub, M) per subspace keeps M on the lane dimension."""
        m = codes.shape[0]
        rec = jax.vmap(
            lambda cb_s, c_s: cb_s.T[:, c_s], in_axes=(0, 1), out_axes=0
        )(self.codebooks, codes.astype(jnp.int32))          # (S, dsub, M)
        return jnp.transpose(rec, (2, 0, 1)).reshape(m, self.d)

    def decode_host(self, codes) -> "np.ndarray":
        """Host (numpy) decode for bulk one-time reconstructions (the
        decoded-bf16 scan cache): TPU gathers of dsub-wide rows pad to
        the 128-lane tile (64x memory blowup at dsub=2), so bulk decode
        is cheaper as 64 numpy fancy-index gathers."""
        import numpy as onp

        codes = onp.asarray(codes)
        cb = onp.asarray(self.codebooks)                    # (S, ksub, dsub)
        m = codes.shape[0]
        out = onp.empty((m, self.d), onp.float32)
        for s in range(self.n_sub):
            out[:, s * self.dsub:(s + 1) * self.dsub] = cb[s][codes[:, s]]
        return out

    def state(self):
        return {"codebooks": self.codebooks, "d": self.d,
                "n_sub": self.n_sub, "ksub": self.ksub}

    @staticmethod
    def from_state(st) -> "ProductQuantizer":
        pq = ProductQuantizer(int(st["d"]), int(st["n_sub"]), int(st["ksub"]))
        pq.codebooks = st["codebooks"]
        pq._dense = None
        return pq
