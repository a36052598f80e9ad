"""Where do the train step's milliseconds go? (round-3 VERDICT #3)

Round 2 measured the B=256-pair train step at 259.9 ms = ~23% bf16 MFU
against ~3x the forward FLOPs, while the forward alone runs at 56% -
but scripts/profile_components.py covers the forward only. This script
decomposes the full step into additive stages, each timed with the
overhead-cancelling IterTimer (one compile per stage, value-unique
dispatches):

    aug        device augment (IR FFT conv + SNR noise mix) of x_j
    logmel     log-mel of the stacked 2B waves
    fwd        train-mode forward (BN stat updates) + NT-Xent loss
    fwd+bwd    value_and_grad of the same
    adam       optimizer update + grad global-norm, fixed grads
    full       the real make_train_step program, eagerly chained

Derived: bwd = (fwd+bwd) - fwd; residual = full - (aug + logmel +
fwd+bwd + adam) ~ scheduling/fusion interactions across stage seams.

Run on the real TPU:  python scripts/profile_train_backward.py [B] [remat]
(B defaults to 256 pairs; pass `remat` to wrap backbone blocks in
jax.checkpoint and compare; pass `fullonly` to skip the per-stage
breakdown and measure only the real make_train_step program - the one
wall-clock stage that is sensitive to host CPU contention.)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

LO, HI, REPS = 2, 6, 2


def stage(name, body, x, flop_item=None, items=None):
    from grafp_tpu.utils.profiling import IterTimer

    timer = IterTimer(body, x)
    t0 = time.time()
    timer.run(HI)
    compile_s = time.time() - t0
    times = {}
    for iters in (LO, HI):
        times[iters] = min(timer.run(iters) for _ in range(REPS))
    per = (times[HI] - times[LO]) / (HI - LO)
    mfu = ""
    if flop_item and items:
        tf = flop_item * items / per / 1e12
        mfu = f"  {tf:6.1f} TF/s = {100 * tf / 197:4.1f}% bf16 MFU"
    print(f"{name:12s} {per * 1e3:8.2f} ms  (compile {compile_s:5.1f}s){mfu}",
          flush=True)
    return per


def main():
    from grafp_tpu.core.config import Config
    from grafp_tpu.dsp.augment import AugmentBanks, augment_waveforms
    from grafp_tpu.dsp.melspec import LogMelConfig, log_mel_spectrogram
    from grafp_tpu.models import build_model
    from grafp_tpu.train import create_train_state, make_train_step
    from grafp_tpu.train.loss import ntxent_loss
    from grafp_tpu.train.step import optax_global_norm

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    remat = "remat" in sys.argv[2:]
    fullonly = "fullonly" in sys.argv[2:]
    donate = "donate" in sys.argv[2:]   # the CLI trains with donate=True
    rng = np.random.RandomState(0)
    banks = AugmentBanks.from_arrays(
        noise_clips=[rng.randn(64000).astype(np.float32) for _ in range(8)],
        ir_clips=[np.r_[1.0, rng.randn(8000) * 0.05].astype(np.float32)
                  for _ in range(4)],
        noise_len=64000, ir_len=8192,
    )
    cfg = Config(compute_dtype="bfloat16", remat=remat)
    mcfg = LogMelConfig.from_config(cfg)
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.key(0), 32)
    params, batch_stats = state.params, state.batch_stats

    x_i = jnp.asarray(rng.randn(b, 16000).astype(np.float32))
    x_j = jnp.asarray(rng.randn(b, 16000).astype(np.float32))
    waves2b = jnp.concatenate([x_i, x_j], axis=0)
    spec2b = log_mel_spectrogram(waves2b, mcfg)
    snr = tuple(float(s) for s in cfg.tr_snr)
    key = jax.random.key(7)

    # forward FLOPs per ITEM (2b items per step); bwd ~ 2x fwd
    FWD_GFLOP = 7.573
    print(f"backend={jax.default_backend()} B={b} pairs (2B={2 * b} items) "
          f"remat={remat} donate={donate} lo/hi={LO}/{HI}", flush=True)

    if not fullonly:
        _stage_breakdown(stage, locals())

    # the real program, eagerly chained (async dispatch amortizes the
    # transport; the final fetch is the fence)
    step = make_train_step(model, cfg, banks, donate=donate)
    st = state
    t0 = time.time()
    st, m = step(st, x_i, x_j, jax.random.key(0))
    float(m["loss"])
    print(f"{'full':12s} compile+first {time.time() - t0:5.1f}s", flush=True)
    iters = 6
    best = float("inf")
    for _ in range(3 if fullonly else 1):
        t0 = time.time()
        for i in range(iters):
            st, m = step(st, x_i, x_j, jax.random.key(i + 1))
        lf = float(m["loss"])
        best = min(best, (time.time() - t0) / iters)
    t_full = best
    FWD_GFLOP = 7.573
    tf = 3 * FWD_GFLOP * 2 * b / t_full / 1e3
    print(f"{'full':12s} {t_full * 1e3:8.2f} ms  ({b / t_full:,.0f} pairs/s, "
          f"loss {lf:.3f})  {tf:6.1f} TF/s = {100 * tf / 197:4.1f}% bf16 MFU",
          flush=True)


def _stage_breakdown(stage, env):
    (model, params, batch_stats, state, banks, cfg, mcfg, b, key, snr,
     x_j, waves2b, spec2b) = (
        env["model"], env["params"], env["batch_stats"], env["state"],
        env["banks"], env["cfg"], env["mcfg"], env["b"], env["key"],
        env["snr"], env["x_j"], env["waves2b"], env["spec2b"])
    from grafp_tpu.dsp.augment import augment_waveforms
    from grafp_tpu.dsp.melspec import log_mel_spectrogram
    from grafp_tpu.train.loss import ntxent_loss
    from grafp_tpu.train.step import optax_global_norm
    import jax

    FWD_GFLOP = 7.573

    stage("aug", lambda w: augment_waveforms(
        w, banks, key, snr, 1.0, 1.0), x_j)
    stage("logmel", lambda w: log_mel_spectrogram(w, mcfg), waves2b)

    def fwd_loss(spec):
        (h, z), upd = model.apply(
            {"params": params, "batch_stats": batch_stats}, spec, True,
            mutable=["batch_stats"], rngs={"droppath": key},
        )
        loss = ntxent_loss(z[:b], z[b:], float(cfg.tau))
        # fold BN stat updates into the checksum so they aren't DCE'd
        return loss + 1e-20 * optax_global_norm(upd["batch_stats"])

    t_fwd = stage("fwd", fwd_loss, spec2b,
                  flop_item=FWD_GFLOP * 1e9, items=2 * b)

    def fwd_bwd(spec):
        def lf(p):
            (h, z), upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, spec, True,
                mutable=["batch_stats"], rngs={"droppath": key},
            )
            return ntxent_loss(z[:b], z[b:], float(cfg.tau)), upd["batch_stats"]

        (loss, stats), grads = jax.value_and_grad(lf, has_aux=True)(params)
        return (loss + optax_global_norm(grads) * 1e-20
                + optax_global_norm(stats) * 1e-20)

    t_fb = stage("fwd+bwd", fwd_bwd, spec2b,
                 flop_item=3 * FWD_GFLOP * 1e9, items=2 * b)
    print(f"{'-> bwd':12s} {(t_fb - t_fwd) * 1e3:8.2f} ms  (derived)",
          flush=True)

    grads = jax.tree.map(jnp.zeros_like, params)

    def adam(g):
        ns = state.apply_gradients(g, batch_stats)
        return optax_global_norm(ns.params) + optax_global_norm(g)

    stage("adam+gnorm", adam, grads)


if __name__ == "__main__":
    main()
