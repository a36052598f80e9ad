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

import jax
import jax.numpy as jnp

from grafp_tpu.retrieval.kmeans import kmeans_multi


def _pq_encode_chunk_impl(data, codebooks, cb_sq, n_sub):
    """Encode a chunk via the dsub-contracting einsum. At dsub=2 this
    underfills the MXU's 128-deep contraction, but measured (v5e,
    scripts/profile_pq_encode.py) it matches a dense block-diagonal
    (m, d) x (d, S*K) matmul end-to-end: XLA fuses the 2-term
    contraction into the subtract+argmax and never materializes the
    (m, S, K) score tensor, so both run at HBM bandwidth; the einsum
    needs no extra codebook state."""
    m = data.shape[0]
    sub = data.reshape(m, n_sub, -1)
    score = jnp.einsum("msd,skd->msk", sub, codebooks,
                       preferred_element_type=jnp.float32)
    score = score - 0.5 * cb_sq[None]
    return jnp.argmax(score, axis=-1).astype(jnp.uint8)


_pq_encode_chunk = jax.jit(_pq_encode_chunk_impl, static_argnames=("n_sub",))


@functools.partial(jax.jit, static_argnames=("n_sub", "chunk"))
def _pq_encode_blocks(data, codebooks, cb_sq, n_sub, chunk):
    """One dispatch for the whole encode: pad + reshape + scanned chunks
    + unpad inside a single jit. An EAGER lax.map dispatches each scan
    iteration separately, and on the remote-TPU transport that costs
    ~25 ms per chunk (measured: 64 chunks made a 0.25 s encode take
    1.4-2.2 s)."""
    m = data.shape[0]
    nblk = -(-m // chunk)
    dp = jnp.pad(data, ((0, nblk * chunk - m), (0, 0)))
    blocks = dp.reshape(nblk, chunk, -1)
    codes = jax.lax.map(
        lambda b: _pq_encode_chunk_impl(b, codebooks, cb_sq, n_sub), blocks
    )
    return codes.reshape(nblk * chunk, n_sub)[:m]


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

    def encode(self, data: jnp.ndarray, chunk: int = 1 << 15) -> jnp.ndarray:
        """(M, d) -> (M, n_sub) uint8 (ksub<=256). ONE jitted dispatch
        scanning 32k-row chunks (the full (M, n_sub, ksub) score tensor
        would be ~0.5 TB for a 7M-row DB; eager per-chunk dispatch costs
        ~25 ms/chunk on the remote transport - see _pq_encode_blocks)."""
        m = data.shape[0]
        cb_sq = jnp.sum(self.codebooks ** 2, axis=-1)       # (S, K)
        if m <= chunk:
            return _pq_encode_chunk(data, self.codebooks, cb_sq, self.n_sub)
        return _pq_encode_blocks(data, self.codebooks, cb_sq, self.n_sub,
                                 chunk)

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

    def decode_host(self, codes, dtype=None) -> "np.ndarray":
        """Host (numpy) decode for bulk one-time reconstructions (the
        decoded-bf16 scan cache): TPU gathers of dsub-wide rows pad to
        the 128-lane tile (64x memory blowup at dsub=2), so bulk decode
        stays on host.

        Row-chunked with ONE broadcast advanced-index per chunk
        (cb[arange(S), codes_chunk] -> (rows, S, dsub)), so output
        writes are contiguous. The per-subspace column-strip loop this
        replaces wrote 2-float pairs at a 512-byte stride, touching
        every cache line of the 16 GB fma_large output 64 times (~1 TB
        of effective traffic - over an hour on this 1-core host).
        `dtype` (e.g. bfloat16) casts per chunk, avoiding a second
        full-size pass."""
        import numpy as onp

        codes = onp.asarray(codes)
        cb = onp.asarray(self.codebooks)                    # (S, ksub, dsub)
        m = codes.shape[0]
        out = onp.empty((m, self.d), dtype or onp.float32)
        sidx = onp.arange(self.n_sub)[None, :]
        chunk = 1 << 20
        for s0 in range(0, m, chunk):
            c = codes[s0:s0 + chunk].astype(onp.intp)       # (mc, S)
            dec = cb[sidx, c].reshape(len(c), self.d)       # contiguous
            out[s0:s0 + len(c)] = dec if dtype is None else dec.astype(dtype)
        return out

    def state(self):
        return {"codebooks": self.codebooks, "d": self.d,
                "n_sub": self.n_sub, "ksub": self.ksub}

    @staticmethod
    def from_state(st) -> "ProductQuantizer":
        pq = ProductQuantizer(int(st["d"]), int(st["n_sub"]), int(st["ksub"]))
        pq.codebooks = st["codebooks"]
        return pq
