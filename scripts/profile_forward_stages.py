"""Forward per-stage MFU on the real chip (round-3: close 56% -> 65%).

Times CUMULATIVE PREFIXES of the production fingerprint pipeline at
B=128 bf16 with the overhead-cancelling IterTimer, then differences
adjacent prefixes to attribute per-stage time:

    logmel                      (B,16000) -> (B,64,32)
    + peak embed                -> (B,1024,8)
    + stem + stage1 (2 blk @64) -> (B,1024,64)
    + stage2 (down + 2 blk @128)-> (B,512,128)
    + stage3 (down + 6 blk @256)-> (B,256,256)
    + stage4 (down + 2 blk @512)-> (B,128,512)
    full (+ proj 1024 + SimCLR head)

Prefix models park a tiny emb_dims=8 projection so the prefix tail adds
negligible work; the full model is the production one. Per-stage MFU
uses scripts/flops_model.py's stage account (1.28/0.94/3.22/1.75 GFLOP
per item + frontend).

Run on the real TPU: python scripts/profile_forward_stages.py [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

LO, HI, REPS = 8, 24, 2
PEAK_TF = 197.0  # v5e bf16

# per-item GFLOP by stage (scripts/flops_model.py; stages fold in their
# leading downsample 0.025/0.050/0.100, stage1 folds the stem; head =
# proj(0.134) + SimCLR projector(0.009); sums to the 7.573 total)
GFLOP = {
    "logmel": 0.069,
    "peak": 0.002,
    "stage1": 1.276,
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
    print(f"{name:24s} {per * 1e3:8.3f} ms  (compile {compile_s:5.1f}s)",
          flush=True)
    return per


def main():
    from grafp_tpu.core.config import Config
    from grafp_tpu.dsp.melspec import LogMelConfig, log_mel_spectrogram
    from grafp_tpu.models import build_model
    from grafp_tpu.models import gnn as gnn_mod
    from grafp_tpu.models.gnn import GraphEncoder
    from grafp_tpu.models.peak_embed import PeakEmbed

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cfg = Config(compute_dtype="bfloat16")
    mcfg = LogMelConfig.from_config(cfg)
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    waves = jnp.asarray(rng.randn(b, cfg.clip_frames).astype(np.float32))

    # truncated presets (cumulative stages of 't')
    full_blocks, full_ch = gnn_mod.SIZE_PRESETS["t"]
    for i in range(1, 5):
        gnn_mod.SIZE_PRESETS[f"p{i}"] = (full_blocks[:i], full_ch[:i])

    print(f"backend={jax.default_backend()} B={b} bf16 lo/hi={LO}/{HI}",
          flush=True)

    results = {}
    results["logmel"] = timeit(
        "logmel", lambda w: log_mel_spectrogram(w, mcfg), waves)

    peak = PeakEmbed(dtype=dtype)
    pvars = peak.init(jax.random.key(0),
                      jnp.zeros((1, cfg.n_mels, cfg.n_frames)))

    def frontend(w):
        return peak.apply(pvars, log_mel_spectrogram(w, mcfg))

    results["frontend"] = timeit("logmel+peak", frontend, waves)

    prev_key = "frontend"
    for i in range(1, 5):
        enc = GraphEncoder(size=f"p{i}", emb_dims=8,
                           knn_strategy=cfg.knn_strategy, dtype=dtype)
        evars = enc.init({"params": jax.random.key(i)},
                         jnp.zeros((1, cfg.n_nodes, 8)), False)

        def prefix(w, _enc=enc, _ev=evars):
            return _enc.apply(_ev, peak.apply(
                pvars, log_mel_spectrogram(w, mcfg)), False)

        results[f"p{i}"] = timeit(f"+stage{i}", prefix, waves)
        prev_key = f"p{i}"

    model = build_model(cfg)
    mvars = model.init({"params": jax.random.key(9)},
                       jnp.zeros((1, cfg.n_mels, cfg.n_frames)), False)

    def full(w):
        _, z = model.apply(mvars, log_mel_spectrogram(w, mcfg), False)
        return z

    results["full"] = timeit("full model", full, waves)

    # attribution by differencing
    print("\nper-stage attribution (ms | us/item | GFLOP | TF/s | MFU):",
          flush=True)
    chain = [("logmel", None, "logmel"), ("frontend", "logmel", "peak"),
             ("p1", "frontend", "stage1"), ("p2", "p1", "stage2"),
             ("p3", "p2", "stage3"), ("p4", "p3", "stage4"),
             ("full", "p4", "head")]
    for key, prev, label in chain:
        dt = results[key] - (results[prev] if prev else 0.0)
        gf = GFLOP[label]
        tf = gf * b / max(dt, 1e-9) / 1e3
        print(f"{label:8s} {dt * 1e3:8.3f} ms  {dt / b * 1e6:7.2f} us/item"
              f"  {gf:5.2f} GF  {tf:6.1f} TF/s = {100 * tf / PEAK_TF:5.1f}%",
              flush=True)
    t = results["full"]
    print(f"\nfull: {t / b * 1e6:.1f} us/item = {b / t:,.0f} fp/s  "
          f"({GFLOP_total() * b / t / 1e3:.1f} TF/s = "
          f"{100 * GFLOP_total() * b / t / 1e3 / PEAK_TF:.1f}% MFU)",
          flush=True)


def GFLOP_total():
    return sum(GFLOP.values())


if __name__ == "__main__":
    main()
