"""int8-dynamic serving path on the real chip: throughput + fidelity.

Times the full fingerprint path (raw audio -> log-mel -> PeakEmbed ->
GraphEncoder -> projector) with serve_quant='int8' against the bf16
production path (bench.py's configuration), using the same
overhead-cancelled IterTimer methodology, then reports the cosine
between the two paths' fingerprints — with the trained rehearsal
checkpoint (checkpoint/model_tc_29_best) when present, else random
init. The int8 path quantizes every backbone matmul (per-output-channel
weight scales + per-tensor dynamic activation scale, int32 accumulate);
the MXU's int8 rate on v5e is 2x bf16, so the FLOP-bound stages are the
upside and the selection kernel (bf16) bounds the rest.

Run on the real TPU: python scripts/profile_quant.py [BATCH]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LO, HI, REPS = 8, 24, 2
GFLOP_PER_FP = 7.573  # scripts/flops_model.py (bf16-equivalent account)
PEAK_TF = 197.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from grafp_tpu.core.config import Config
    from grafp_tpu.dsp.melspec import LogMelConfig, log_mel_spectrogram
    from grafp_tpu.models import build_model
    from grafp_tpu.utils.profiling import IterTimer

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    backend = jax.default_backend()
    dtype = "bfloat16" if backend == "tpu" else "float32"

    variants = {}
    for name, quant in (("bf16", "none"), ("int8", "int8")):
        cfg = Config(compute_dtype=dtype, serve_quant=quant)
        variants[name] = (cfg, build_model(cfg))
    cfg0, model0 = variants["bf16"]
    mcfg = LogMelConfig.from_config(cfg0)

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
    print(f"params: {src}")

    waves = jax.random.normal(
        jax.random.key(1), (batch, cfg0.clip_frames), jnp.float32)

    results = {}
    zs = {}
    for name, (cfg, model) in variants.items():
        def fingerprint(w, model=model):
            spec = log_mel_spectrogram(w, mcfg)
            _, z = model.apply(
                {"params": params, "batch_stats": batch_stats}, spec, False)
            return z

        zs[name] = np.asarray(
            jax.jit(fingerprint)(waves), np.float32)

        timer = IterTimer(fingerprint, waves)
        t0 = time.time()
        timer.run(HI)
        compile_s = time.time() - t0
        times = {i: min(timer.run(i) for _ in range(REPS)) for i in (LO, HI)}
        per = (times[HI] - times[LO]) / (HI - LO)
        fps = batch / per
        tf = fps * GFLOP_PER_FP / 1e3
        results[name] = fps
        print(f"{name}: {per / batch * 1e6:7.2f} us/item = {fps:8,.0f} fp/s "
              f"({tf:.1f} TF/s = {100 * tf / PEAK_TF:.1f}% of bf16 peak; "
              f"compile {compile_s:.1f}s)")

    cos = np.sum(zs["bf16"] * zs["int8"], axis=-1)  # both L2-normalized
    print(f"fingerprint cosine int8-vs-bf16: min {cos.min():.5f} "
          f"mean {cos.mean():.5f}")
    print(f"int8 speedup: {results['int8'] / results['bf16']:.3f}x")


if __name__ == "__main__":
    main()
