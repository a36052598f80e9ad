"""Why does the TRAIN-mode forward run at 32.7% MFU when the eval-mode
forward (bench.py path) measures 56%? (round-3 train-step attack)

Times, at identical shapes (2B=512 items, spec input, bf16):
    fwd-eval     model.apply(train=False)  - BN running stats, no mutable
    fwd-train    model.apply(train=True, mutable=batch_stats) + NT-Xent
    fwd-train-nl same without the NT-Xent loss (isolates the loss)

The fwd-eval/fwd-train difference is the train-mode overhead: BN batch
statistics (each BN must reduce over the batch BEFORE normalizing,
breaking the conv->BN->act fusion chain that eval mode folds) plus the
mutable-collection plumbing. Run: python scripts/profile_fwd_gap.py [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

LO, HI, REPS = 2, 6, 2
FWD_GFLOP = 7.504  # per item, minus logmel (7.573 - 0.069)


def stage(name, body, x, items):
    from grafp_tpu.utils.profiling import IterTimer

    timer = IterTimer(body, x)
    t0 = time.time()
    timer.run(HI)
    compile_s = time.time() - t0
    times = {}
    for iters in (LO, HI):
        times[iters] = min(timer.run(iters) for _ in range(REPS))
    per = (times[HI] - times[LO]) / (HI - LO)
    tf = FWD_GFLOP * 1e9 * items / per / 1e12
    print(f"{name:14s} {per * 1e3:8.2f} ms  {per / items * 1e6:6.1f} us/item"
          f"  (compile {compile_s:5.1f}s)  {tf:6.1f} TF/s = "
          f"{100 * tf / 197:4.1f}% bf16 MFU", flush=True)
    return per


def main():
    from grafp_tpu.core.config import Config
    from grafp_tpu.dsp.melspec import LogMelConfig, log_mel_spectrogram
    from grafp_tpu.models import build_model
    from grafp_tpu.train import create_train_state
    from grafp_tpu.train.loss import ntxent_loss
    from grafp_tpu.train.step import optax_global_norm

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rng = np.random.RandomState(0)
    cfg = Config(compute_dtype="bfloat16")
    mcfg = LogMelConfig.from_config(cfg)
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.key(0), 32)
    params, batch_stats = state.params, state.batch_stats

    waves2b = jnp.asarray(rng.randn(2 * b, 16000).astype(np.float32))
    spec2b = log_mel_spectrogram(waves2b, mcfg)
    key = jax.random.key(7)

    print(f"backend={jax.default_backend()} 2B={2 * b} items bf16 "
          f"lo/hi={LO}/{HI}", flush=True)

    def fwd_eval(spec):
        h, z = model.apply(
            {"params": params, "batch_stats": batch_stats}, spec, False
        )
        return jnp.sum(z.astype(jnp.float32) ** 2)

    stage("fwd-eval", fwd_eval, spec2b, 2 * b)

    def fwd_train_nl(spec):
        (h, z), upd = model.apply(
            {"params": params, "batch_stats": batch_stats}, spec, True,
            mutable=["batch_stats"], rngs={"droppath": key},
        )
        return (jnp.sum(z.astype(jnp.float32) ** 2)
                + 1e-20 * optax_global_norm(upd["batch_stats"]))

    stage("fwd-train-nl", fwd_train_nl, spec2b, 2 * b)

    def fwd_train(spec):
        (h, z), upd = model.apply(
            {"params": params, "batch_stats": batch_stats}, spec, True,
            mutable=["batch_stats"], rngs={"droppath": key},
        )
        loss = ntxent_loss(z[:b], z[b:], float(cfg.tau))
        return loss + 1e-20 * optax_global_norm(upd["batch_stats"])

    stage("fwd-train", fwd_train, spec2b, 2 * b)


if __name__ == "__main__":
    main()
