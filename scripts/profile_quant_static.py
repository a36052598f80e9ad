"""Static-calibrated int8 serving vs dynamic int8 vs bf16 (round-4
VERDICT #7).

Round 3 measured dynamic int8 at 0.927x bf16 (profile_quant.py): the
per-layer dynamic activation-max passes + dequant epilogues cost more
than the MXU's 2x int8 rate saves. The builder's own verdict left one
door open: a STATIC-calibrated variant (no max passes) is "the only
plausible int8 win". This script measures it:

    bf16         production serving path (the 14.6k fp/s baseline)
    int8         dynamic scales (now emitting the compute dtype after
                 the ADVICE-r3 fix - re-measured, not reused)
    int8_static  per-layer scales calibrated offline on a separate
                 synthetic batch (models/simclr.calibrate_act_scales);
                 serving runs zero activation-max passes

Same overhead-cancelled IterTimer harness as profile_quant.py; fidelity
via fingerprint cosine vs the f32 reference on held-out inputs. Uses the
trained rehearsal checkpoint when present (realistic activation ranges),
else random init.

Run on the real TPU (alone; the int8 compiles are slow - round 3
measured 513 s for dynamic): python scripts/profile_quant_static.py [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LO, HI, REPS = 8, 24, 2
GFLOP_PER_FP = 7.573
PEAK_TF = 197.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from grafp_tpu.core.config import Config
    from grafp_tpu.dsp.melspec import LogMelConfig, log_mel_spectrogram
    from grafp_tpu.models import build_model
    from grafp_tpu.models.simclr import calibrate_act_scales
    from grafp_tpu.utils.profiling import IterTimer

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    backend = jax.default_backend()
    dtype = "bfloat16" if backend == "tpu" else "float32"

    cfg0 = Config(compute_dtype=dtype)
    mcfg = LogMelConfig.from_config(cfg0)
    model0 = build_model(cfg0)
    variables = model0.init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, cfg0.n_mels, cfg0.n_frames), jnp.float32), False)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    ckp = os.path.abspath("checkpoint/model_tc_29_best")
    src = "random init"
    if os.path.isdir(ckp):
        from grafp_tpu.train.checkpoint import load_ckp

        payload = load_ckp(ckp)
        params, batch_stats = payload["params"], payload["batch_stats"]
        src = f"{ckp} (epoch {payload.get('epoch')})"
    print(f"params: {src}", flush=True)

    waves = jax.random.normal(
        jax.random.key(1), (batch, cfg0.clip_frames), jnp.float32)

    # calibration on a SEPARATE synthetic batch (held-out serve inputs)
    calib_waves = jax.random.normal(
        jax.random.key(2), (batch, cfg0.clip_frames), jnp.float32)
    t0 = time.time()
    scales = calibrate_act_scales(
        cfg0, params, batch_stats,
        [log_mel_spectrogram(calib_waves, mcfg)])
    n_scales = len(jax.tree.leaves(scales))
    print(f"calibrated {n_scales} act scales in {time.time()-t0:.1f}s",
          flush=True)

    # f32 reference fingerprints for fidelity
    cfg_f32 = Config(compute_dtype="float32")
    model_f32 = build_model(cfg_f32)

    def fp_f32(w):
        _, z = model_f32.apply(
            {"params": params, "batch_stats": batch_stats},
            log_mel_spectrogram(w, mcfg), False)
        return z

    z_ref = np.asarray(jax.jit(fp_f32)(waves), np.float32)

    results = {}
    for name, quant in (("bf16", "none"), ("int8", "int8"),
                        ("int8_static", "int8_static")):
        cfg = Config(compute_dtype=dtype, serve_quant=quant)
        model = build_model(cfg)
        extra = {"act_scales": scales} if quant == "int8_static" else {}

        def fingerprint(w, _m=model, _e=extra):
            spec = log_mel_spectrogram(w, mcfg)
            _, z = _m.apply(
                {"params": params, "batch_stats": batch_stats, **_e},
                spec, False)
            return z

        z = np.asarray(jax.jit(fingerprint)(waves), np.float32)
        cos = np.sum(z * z_ref, axis=-1)

        timer = IterTimer(fingerprint, waves)
        t0 = time.time()
        timer.run(HI)
        compile_s = time.time() - t0
        times = {}
        for iters in (LO, HI):
            times[iters] = min(timer.run(iters) for _ in range(REPS))
        per = (times[HI] - times[LO]) / (HI - LO)
        us = per / batch * 1e6
        tf = GFLOP_PER_FP * batch / per / 1e3
        results[name] = us
        print(f"{name:12s} {us:7.2f} us/item = {batch/per:,.0f} fp/s "
              f"({tf:5.1f} TF/s-bf16-equiv = {100*tf/PEAK_TF:4.1f}%)  "
              f"cos vs f32: min {cos.min():.5f} mean {cos.mean():.5f}  "
              f"(compile {compile_s:.0f}s)", flush=True)

    for name in ("int8", "int8_static"):
        if name in results:
            print(f"{name} vs bf16: {results['bf16']/results[name]:.3f}x",
                  flush=True)


if __name__ == "__main__":
    main()
