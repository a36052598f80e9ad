"""PQ bulk-encode throughput (VERDICT r1 weak #7: 7M rows ~ 8 min).

Compares the shipped dense block-diagonal encode against the old
dsub-contracting einsum at DB-build scale. Run on the real TPU.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from grafp_tpu.retrieval.pq import ProductQuantizer

M = 1 << 21  # 2M rows (scale measured rates to 7M linearly)
D, NSUB = 128, 64


@functools.partial(jax.jit, static_argnames=("n_sub", "dsub"))
def _encode_einsum(data, codebooks, n_sub, dsub):
    sub = data.reshape(data.shape[0], n_sub, dsub)
    score = jnp.einsum("msd,skd->msk", sub, codebooks,
                       preferred_element_type=jnp.float32)
    score = score - 0.5 * jnp.sum(codebooks ** 2, axis=-1)[None]
    return jnp.argmax(score, axis=-1).astype(jnp.uint8)


def fence(codes):
    return int(np.asarray(codes[::65536]).sum())  # data-dependent fetch


def main():
    rng = np.random.RandomState(0)
    print(f"backend={jax.default_backend()} M={M:,} d={D} n_sub={NSUB}",
          flush=True)
    pq = ProductQuantizer(D, NSUB)
    pq.train(jax.random.key(0),
             jnp.asarray(rng.randn(1 << 15, D).astype(np.float32)))
    data = jnp.asarray(rng.randn(M, D).astype(np.float32))

    t0 = time.time()
    fence(pq.encode(data))
    compile_s = time.time() - t0
    t0 = time.time()
    new_codes = pq.encode(data)
    fence(new_codes)
    t_new = time.time() - t0
    print(f"dense block-diag encode: {t_new:6.2f}s "
          f"({M/t_new/1e6:.2f} Mrows/s, 7M in {7e6/(M/t_new):.0f}s) "
          f"[compile {compile_s:.0f}s]", flush=True)

    chunk = 1 << 15
    nblk = M // chunk
    blocks = data.reshape(nblk, chunk, D)
    run_old = jax.jit(lambda b: jax.lax.map(
        lambda x: _encode_einsum(x, pq.codebooks, NSUB, D // NSUB), b))
    t0 = time.time()
    fence(run_old(blocks))
    compile_s = time.time() - t0
    t0 = time.time()
    old_codes = run_old(blocks)
    fence(old_codes)
    t_old = time.time() - t0
    print(f"old dsub-einsum encode:  {t_old:6.2f}s "
          f"({M/t_old/1e6:.2f} Mrows/s) [compile {compile_s:.0f}s] "
          f"-> speedup {t_old/t_new:.1f}x", flush=True)

    same = np.mean(
        np.asarray(new_codes[:65536]) ==
        np.asarray(old_codes).reshape(M, NSUB)[:65536]
    )
    print(f"code agreement on 64k rows: {same:.6f}", flush=True)


if __name__ == "__main__":
    main()
