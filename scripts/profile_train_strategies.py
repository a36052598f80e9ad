"""Time the fused train step under each kNN strategy (onehot vs pallas).

Round-1 measured 275 ms (onehot) vs 307 ms (pallas, whose backward then
recomputed the XLA onehot path); models/gnn.py's 'auto' picks onehot for
training on that basis. The pallas kernel now has a real VMEM backward
(ops/pallas_knn.py:_bwd_kernel) and a bf16 extraction matmul - re-measure
and update the auto rule if the kernel wins.

Run on the real TPU: python scripts/profile_train_strategies.py [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from grafp_tpu.core.config import Config
    from grafp_tpu.dsp.augment import AugmentBanks
    from grafp_tpu.models import build_model
    from grafp_tpu.train import create_train_state, make_train_step

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rng = np.random.RandomState(0)
    banks = AugmentBanks.from_arrays(
        noise_clips=[rng.randn(64000).astype(np.float32) for _ in range(8)],
        ir_clips=[np.r_[1.0, rng.randn(8000) * 0.05].astype(np.float32)
                  for _ in range(4)],
        noise_len=64000, ir_len=8192,
    )
    x_i = jnp.asarray(rng.randn(b, 16000).astype(np.float32))
    x_j = jnp.asarray(rng.randn(b, 16000).astype(np.float32))
    print(f"backend={jax.default_backend()} B={b}", flush=True)

    for strategy in ("onehot", "pallas"):
        cfg = Config(compute_dtype="bfloat16", knn_strategy=strategy)
        model = build_model(cfg)
        state = create_train_state(model, cfg, jax.random.key(0), 32)
        step = make_train_step(model, cfg, banks, donate=False)
        t0 = time.time()
        state, m = step(state, x_i, x_j, jax.random.key(0))
        float(m["loss"])
        print(f"[{strategy}] compile+first: {time.time()-t0:.0f}s",
              flush=True)
        iters = 5
        t0 = time.time()
        for i in range(iters):
            state, m = step(state, x_i, x_j, jax.random.key(i + 1))
        lf = float(m["loss"])
        dt = (time.time() - t0) / iters
        print(f"[{strategy}] step: {dt*1e3:.1f} ms ({b/dt:,.0f} pairs/s, "
              f"loss {lf:.3f})", flush=True)


if __name__ == "__main__":
    main()
