"""Backward per-stage attribution on the real chip (round-4 VERDICT #3).

The round-3 train-step account (profile_train_backward.py, B=256 pairs):
fwd 60.2 ms (32.7% MFU) / bwd 138.7 ms (~28% MFU) — two-thirds of every
training second is backward, and it has never had the per-stage
attribution the forward got (profile_forward_stages.py). This script
closes that: it times CUMULATIVE PREFIXES of the train-mode model (BN
batch stats mutable, droppath rng live, same code path as the train
step's loss fn) both forward-only and value_and_grad, then differences
adjacent prefixes:

    bwd(stage k) = [fb(p_k) - fb(p_{k-1})] - [fwd(p_k) - fwd(p_{k-1})]

Prefix models park an emb_dims=8 projection (negligible tail); the full
model uses the production SimCLR head + NT-Xent like the real step.
Stage MFU uses the 2x-forward bwd FLOP convention (grad wrt params +
grad wrt inputs each cost one forward-sized matmul set).

Run on the real TPU (alone — ~10 big compiles, budget ~45-60 min):
    python scripts/profile_bwd_stages.py [B_pairs]

Pass `blocks` to additionally time ISOLATED per-block train-mode
fwd+bwd at the four stage shapes (locates within-stage cost: MRConv
pallas-VJP vs FFN bwd vs BN bwd).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

LO, HI, REPS = 2, 6, 2
PEAK_TF = 197.0  # v5e bf16

# per-item forward GFLOP by stage (scripts/flops_model.py; stage1 folds
# the stem+frontend, stages fold their leading downsample, head = proj +
# SimCLR projector). Backward ~ 2x these.
GFLOP = {
    "stage1": 1.276 + 0.069 + 0.002,
    "stage2": 0.965,
    "stage3": 3.271,
    "stage4": 1.845,
    "head": 0.143,
}


def timeit(name, fn, x):
    from grafp_tpu.utils.profiling import IterTimer

    timer = IterTimer(fn, x)
    t0 = time.time()
    timer.run(HI)
    compile_s = time.time() - t0
    times = {}
    for iters in (LO, HI):
        times[iters] = min(timer.run(iters) for _ in range(REPS))
    per = (times[HI] - times[LO]) / (HI - LO)
    print(f"{name:16s} {per * 1e3:8.2f} ms  (compile {compile_s:5.1f}s)",
          flush=True)
    return per


def main():
    from grafp_tpu.core.config import Config
    from grafp_tpu.models import build_model
    from grafp_tpu.models import gnn as gnn_mod
    from grafp_tpu.models.gnn import GraphEncoder
    from grafp_tpu.models.peak_embed import PeakEmbed
    from grafp_tpu.train.loss import ntxent_loss
    from grafp_tpu.train.step import optax_global_norm

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 256   # pairs
    items = 2 * b
    do_blocks = "blocks" in sys.argv[2:]
    cfg = Config(compute_dtype="bfloat16")
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    key = jax.random.key(7)
    spec = jnp.asarray(
        rng.randn(items, cfg.n_mels, cfg.n_frames).astype(np.float32))

    full_blocks, full_ch = gnn_mod.SIZE_PRESETS["t"]
    for i in range(1, 5):
        gnn_mod.SIZE_PRESETS[f"p{i}"] = (full_blocks[:i], full_ch[:i])

    print(f"backend={jax.default_backend()} B={b} pairs ({items} items) "
          f"bf16 train-mode lo/hi={LO}/{HI}", flush=True)

    peak = PeakEmbed(dtype=dtype)
    pvars = peak.init(jax.random.key(0),
                      jnp.zeros((1, cfg.n_mels, cfg.n_frames)))

    results = {}
    for i in range(1, 5):
        enc = GraphEncoder(size=f"p{i}", emb_dims=8,
                           knn_strategy=cfg.knn_strategy, dtype=dtype)
        evars = enc.init({"params": jax.random.key(i)},
                         jnp.zeros((1, cfg.n_nodes, 8)), False)
        params0 = {"peak": pvars["params"], "enc": evars["params"]}
        stats0 = evars.get("batch_stats", {})

        def fwd_loss(s, _p=params0, _bs=stats0, _enc=enc):
            x = peak.apply({"params": _p["peak"]}, s)
            out, upd = _enc.apply(
                {"params": _p["enc"], "batch_stats": _bs}, x, True,
                mutable=["batch_stats"], rngs={"droppath": key},
            )
            return (jnp.mean(jnp.square(out.astype(jnp.float32)))
                    + 1e-20 * optax_global_norm(upd["batch_stats"]))

        def fwd_bwd(s, _p=params0, _bs=stats0, _enc=enc):
            def lf(p):
                x = peak.apply({"params": p["peak"]}, s)
                out, upd = _enc.apply(
                    {"params": p["enc"], "batch_stats": _bs}, x, True,
                    mutable=["batch_stats"], rngs={"droppath": key},
                )
                return (jnp.mean(jnp.square(out.astype(jnp.float32))),
                        upd["batch_stats"])

            (loss, st), grads = jax.value_and_grad(lf, has_aux=True)(_p)
            return (loss + 1e-20 * optax_global_norm(grads)
                    + 1e-20 * optax_global_norm(st))

        results[f"p{i}_f"] = timeit(f"p{i} fwd", fwd_loss, spec)
        results[f"p{i}_fb"] = timeit(f"p{i} fwd+bwd", fwd_bwd, spec)

    # full production model: SimCLR head + the real NT-Xent loss
    model = build_model(cfg)
    mvars = model.init({"params": jax.random.key(9)},
                       jnp.zeros((1, cfg.n_mels, cfg.n_frames)), False)
    mparams, mstats = mvars["params"], mvars.get("batch_stats", {})

    def full_fwd(s):
        (h, z), upd = model.apply(
            {"params": mparams, "batch_stats": mstats}, s, True,
            mutable=["batch_stats"], rngs={"droppath": key},
        )
        return (ntxent_loss(z[:b], z[b:], float(cfg.tau))
                + 1e-20 * optax_global_norm(upd["batch_stats"]))

    def full_fwd_bwd(s):
        def lf(p):
            (h, z), upd = model.apply(
                {"params": p, "batch_stats": mstats}, s, True,
                mutable=["batch_stats"], rngs={"droppath": key},
            )
            return (ntxent_loss(z[:b], z[b:], float(cfg.tau)),
                    upd["batch_stats"])

        (loss, st), grads = jax.value_and_grad(lf, has_aux=True)(mparams)
        return (loss + 1e-20 * optax_global_norm(grads)
                + 1e-20 * optax_global_norm(st))

    results["full_f"] = timeit("full fwd", full_fwd, spec)
    results["full_fb"] = timeit("full fwd+bwd", full_fwd_bwd, spec)

    print("\nper-stage attribution "
          "(fwd ms | bwd ms | bwd us/item | bwd TF/s | bwd MFU):",
          flush=True)
    chain = [("p1", None, "stage1"), ("p2", "p1", "stage2"),
             ("p3", "p2", "stage3"), ("p4", "p3", "stage4"),
             ("full", "p4", "head")]
    tot_f = tot_b = 0.0
    for cur, prev, label in chain:
        df = results[f"{cur}_f"] - (results[f"{prev}_f"] if prev else 0.0)
        dfb = results[f"{cur}_fb"] - (results[f"{prev}_fb"] if prev else 0.0)
        dbwd = dfb - df
        gf_bwd = 2.0 * GFLOP[label]
        tf = gf_bwd * items / max(dbwd, 1e-9) / 1e3
        print(f"{label:8s} {df * 1e3:8.2f} | {dbwd * 1e3:8.2f} | "
              f"{dbwd / items * 1e6:7.2f} | {tf:6.1f} | "
              f"{100 * tf / PEAK_TF:5.1f}%", flush=True)
        tot_f += df
        tot_b += dbwd
    print(f"{'TOTAL':8s} {tot_f * 1e3:8.2f} | {tot_b * 1e3:8.2f}   "
          f"(full fwd+bwd {results['full_fb'] * 1e3:.2f} ms)", flush=True)

    if do_blocks:
        _block_breakdown(b, cfg, dtype, key)


def _block_breakdown(b, cfg, dtype, key):
    """Isolated train-mode Grapher-block and FFN fwd+bwd at the four
    stage shapes: where inside a stage does the backward go?"""
    from grafp_tpu.models.gnn import FFN, Grapher
    from grafp_tpu.train.step import optax_global_norm

    items = 2 * b
    rng = np.random.RandomState(1)
    print("\nisolated blocks (train fwd+bwd per call, ms):", flush=True)
    for n, c in [(1024, 64), (512, 128), (256, 256), (128, 512)]:
        x = jnp.asarray(rng.randn(items, n, c).astype(np.float32))
        for label, mod in [
            ("grapher", Grapher(features=c, k=cfg.k,
                                knn_strategy=cfg.knn_strategy, dtype=dtype)),
            ("ffn", FFN(features=c, hidden=4 * c, dtype=dtype)),
        ]:
            try:
                mvars = mod.init({"params": jax.random.key(0)},
                                 jnp.zeros((1, n, c)), False)
            except Exception as e:   # FFN signature may differ
                print(f"  ({label} @{n}x{c}: init failed {e})", flush=True)
                continue
            p0, bs0 = mvars["params"], mvars.get("batch_stats", {})

            def fb(xx, _p=p0, _bs=bs0, _m=mod):
                def lf(p):
                    out, upd = _m.apply(
                        {"params": p, "batch_stats": _bs}, xx, True,
                        mutable=["batch_stats"], rngs={"droppath": key},
                    )
                    return (jnp.mean(jnp.square(out.astype(jnp.float32))),
                            upd["batch_stats"])

                (loss, st), g = jax.value_and_grad(lf, has_aux=True)(_p)
                return (loss + 1e-20 * optax_global_norm(g)
                        + 1e-20 * optax_global_norm(st))

            t = timeit(f"{label} @{n}x{c}", fb, x)
            print(f"    -> {t / items * 1e6:7.2f} us/item", flush=True)


if __name__ == "__main__":
    main()
