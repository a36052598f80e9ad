"""Close the non-Grapher MFU rows (round-4; VERDICT r3 'what's weak' #3).

The round-3 forward table closed the Grapher-block pools with three
measured attacks, but extrapolated the remaining rows: logmel 46% MFU,
head 49% (stage-2/3/4 sit inside the closed Grapher account). This
script interrogates those two pools the same way stage-1 was closed —
time each pool's MATMULS IN ISOLATION at their exact production shapes,
then add the epilogues back one at a time. If the isolated matmuls
already run near the 85% the FFN shapes reach, the gap is the epilogue
(VPU elementwise / reductions), i.e. shape/epilogue-bound, not
schedulable waste; if they don't, the shapes themselves are the ceiling
and the row closes like stage-1's C=64 account.

Pools (B=128 bf16, production geometry):
  logmel: frames (B,33,1024) -> DFT re/im matmuls (1024,513)x2
          [513 = 4x128+1 output lanes -> Mosaic pads to 640: 20% of the
          lane writes are padding by construction]
          -> power -> mel matmul (513,64) -> log10
  head:   proj conv (B*128,512)@(512,1024) -> mean over 128 nodes
          -> fc1 (B,1024)@(1024,4096) -> ELU -> fc2 (B,4096)@(4096,128)
          -> L2 normalize

Run on the real TPU (alone): python scripts/profile_tail_pools.py [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LO, HI, REPS = 64, 256, 2   # sub-ms targets need long spans (CLAUDE.md)
PEAK_TF = 197.0


def timeit(name, fn, *args, gflop_item=None, batch=None):
    from grafp_tpu.utils.profiling import IterTimer

    timer = IterTimer(fn, *args)
    t0 = time.time()
    timer.run(HI)
    compile_s = time.time() - t0
    times = {}
    for iters in (LO, HI):
        times[iters] = min(timer.run(iters) for _ in range(REPS))
    per = (times[HI] - times[LO]) / (HI - LO)
    us_item = per / batch * 1e6
    line = f"{name:28s} {per*1e3:8.3f} ms  {us_item:7.3f} us/item"
    if gflop_item:
        tf = gflop_item * batch / per / 1e3
        line += f"  {tf:6.1f} TF/s = {100*tf/PEAK_TF:4.1f}% MFU"
    print(line + f"  (compile {compile_s:.0f}s)", flush=True)
    return per


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from grafp_tpu.core.config import Config
    from grafp_tpu.dsp.melspec import (LogMelConfig, _frame, _rdft_bases,
                                       log_mel_spectrogram, mel_filterbank)
    from grafp_tpu.ops.knn import l2_normalize

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cfg = Config(compute_dtype="bfloat16")
    mcfg = LogMelConfig.from_config(cfg)
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    print(f"backend={jax.default_backend()} B={b} bf16 "
          f"spans lo/hi={LO}/{HI}", flush=True)

    # ---------------- logmel pool ----------------
    waves = jnp.asarray(rng.randn(b, cfg.clip_frames).astype(np.float32))
    frames = _frame(waves, mcfg.n_fft, mcfg.hop_length)      # (B, 33, 1024)
    nfr = frames.shape[-2]
    nfreq = mcfg.n_fft // 2 + 1
    # per-item GFLOP: 2 DFT matmuls + mel matmul (flops_model.py account)
    g_dft = 2 * 2 * nfr * mcfg.n_fft * nfreq / 1e9
    g_mel = 2 * nfr * nfreq * mcfg.n_mels / 1e9
    cos_b, sin_b = _rdft_bases(mcfg.n_fft, mcfg.win_length)
    cos_b = jnp.asarray(cos_b, dt)
    sin_b = jnp.asarray(sin_b, dt)
    fb = jnp.asarray(mel_filterbank(nfreq, mcfg.n_mels, mcfg.sample_rate,
                                    mcfg.f_min, mcfg.f_max), dt)
    frames_b = frames.astype(dt)

    def dft_only(fr):
        # one array out (IterTimer checksums the output); the add is
        # epsilon next to the two (B*33,1024)@(1024,513) matmuls
        re = jnp.matmul(fr, cos_b, preferred_element_type=jnp.float32)
        im = jnp.matmul(fr, sin_b, preferred_element_type=jnp.float32)
        return re + im

    def dft_power_mel(fr):
        re = jnp.matmul(fr, cos_b, preferred_element_type=jnp.float32)
        im = jnp.matmul(fr, sin_b, preferred_element_type=jnp.float32)
        p = re * re + im * im
        return jnp.einsum("...tf,fm->...mt", p.astype(dt), fb,
                          preferred_element_type=jnp.float32)

    print("\n-- logmel pool --", flush=True)
    timeit("dft matmuls only", lambda fr: dft_only(fr),
           frames_b, gflop_item=g_dft, batch=b)
    timeit("+ power + mel matmul", dft_power_mel,
           frames_b, gflop_item=g_dft + g_mel, batch=b)
    timeit("full logmel (prod path)",
           lambda w: log_mel_spectrogram(w, mcfg), waves,
           gflop_item=g_dft + g_mel, batch=b)

    # ---------------- head pool ----------------
    n_nodes, c4, emb, hid, d = 128, 512, 1024, 4096, 128
    x4 = jnp.asarray(rng.randn(b, n_nodes, c4).astype(np.float32), dt)
    w_proj = jnp.asarray(rng.randn(c4, emb).astype(np.float32) * 0.02, dt)
    w_fc1 = jnp.asarray(rng.randn(emb, hid).astype(np.float32) * 0.02, dt)
    w_fc2 = jnp.asarray(rng.randn(hid, d).astype(np.float32) * 0.02, dt)
    g_proj = 2 * n_nodes * c4 * emb / 1e9
    g_fc = (2 * emb * hid + 2 * hid * d) / 1e9

    def proj_only(x):
        return jnp.einsum("bnc,ce->bne", x, w_proj,
                          preferred_element_type=jnp.float32)

    def proj_mean(x):
        return jnp.mean(proj_only(x), axis=1)

    def head_full(x):
        h = proj_mean(x).astype(dt)
        z = jnp.maximum(h @ w_fc1, 0)            # stand-in act epilogue
        z = (z.astype(dt) @ w_fc2)
        return l2_normalize(z, axis=-1)

    print("\n-- head pool --", flush=True)
    timeit("proj matmul only", proj_only, x4, gflop_item=g_proj, batch=b)
    timeit("+ mean over nodes", proj_mean, x4, gflop_item=g_proj, batch=b)
    timeit("+ projector + l2norm", head_full, x4,
           gflop_item=g_proj + g_fc, batch=b)
    # the projector matmuls alone: M=B rows only
    hvec = jnp.asarray(rng.randn(b, emb).astype(np.float32), dt)

    def projector_only(h):
        z = jnp.maximum(h @ w_fc1, 0)
        return z.astype(dt) @ w_fc2

    timeit("projector matmuls (M=B)", projector_only, hvec,
           gflop_item=g_fc, batch=b)


if __name__ == "__main__":
    main()
