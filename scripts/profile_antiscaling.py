"""Localize the batch anti-scaling (VERDICT r1 missing #2).

Throughput per chip FALLS as batch grows (9.4k fp/s at B<=64 -> 6.9k at
B=256 -> 5.6k at B=1024). Per-item cost should be flat once the MXU is
saturated, so some component's per-item cost grows with B. This script
times each pipeline component at two batch sizes and prints us/item for
both - the anti-scaling component is the one whose us/item rises.

Run on the real TPU: python scripts/profile_antiscaling.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

BATCHES = (64, 256)  # override: argv ints, e.g. "64"


def timed(name, make_body, batch):
    """make_body(B) -> (body, x) with body(x) -> array.

    Uses scan_time_per_iter (difference of two scan lengths) so the
    remote transport's fixed ~30-45 ms dispatch+fetch cost cancels -
    dividing it by reps*batch is exactly what made every component look
    like it cost ~50 us/item at B=64 in the round-1 measurements.
    """
    from grafp_tpu.utils.profiling import scan_time_per_iter

    body, x = make_body(batch)
    r = scan_time_per_iter(body, x, iters_lo=8, iters_hi=40)
    per_item_us = r["per_iter_s"] / batch * 1e6
    return per_item_us, r["compile_s"]


def main():
    global BATCHES
    if len(sys.argv) > 1:
        BATCHES = tuple(int(a) for a in sys.argv[1:])
    rng = np.random.RandomState(0)
    print(f"backend={jax.default_backend()} (overhead-cancelled timing)", flush=True)

    from grafp_tpu.core.config import Config
    from grafp_tpu.dsp.melspec import LogMelConfig, log_mel_spectrogram
    from grafp_tpu.models import build_model
    from grafp_tpu.models.gnn import FFN, Grapher
    from grafp_tpu.models.peak_embed import PeakEmbed
    from grafp_tpu.ops.pallas_knn import max_neighbors_pallas

    cases = []

    def full_model(B):
        cfg = Config(compute_dtype="bfloat16")
        model = build_model(cfg)
        mcfg = LogMelConfig.from_config(cfg)
        v = model.init({"params": jax.random.key(0)},
                       jnp.zeros((1, 64, 32)), False)

        def body(w):
            spec = log_mel_spectrogram(w, mcfg)
            _, z = model.apply(v, spec, False)
            return z

        return body, jnp.asarray(rng.randn(B, 16000).astype(np.float32))

    cases.append(("full model (pallas/bf16)", full_model))

    def logmel(B):
        mcfg = LogMelConfig()
        return (lambda w: log_mel_spectrogram(w, mcfg),
                jnp.asarray(rng.randn(B, 16000).astype(np.float32)))

    cases.append(("logmel", logmel))

    def peak(B):
        pe = PeakEmbed()
        spec = jnp.asarray(rng.randn(B, 64, 32).astype(np.float32))
        pv = pe.init(jax.random.key(0), spec)
        return (lambda s: pe.apply(pv, s)), spec

    cases.append(("peak embed", peak))

    for (n, c) in ((1024, 64), (512, 128), (256, 256), (128, 512)):
        def kern(B, n=n, c=c):
            x = jnp.asarray(rng.randn(B, n, c).astype(np.float32))
            return (lambda x: max_neighbors_pallas(x, 3)), x

        cases.append((f"pallas kNN N={n} C={c}", kern))

        def kern_bf16(B, n=n, c=c):
            x = jnp.asarray(rng.randn(B, n, c)).astype(jnp.bfloat16)
            return (lambda x: max_neighbors_pallas(x, 3)), x

        cases.append((f"pallas kNN N={n} C={c} bf16", kern_bf16))

        def grapher(B, n=n, c=c):
            x = jnp.asarray(rng.randn(B, n, c)).astype(jnp.bfloat16)
            g = Grapher(features=c, k=3, knn_strategy="pallas",
                        dtype=jnp.bfloat16)
            gv = g.init(jax.random.key(0), x, False)
            return (lambda x: g.apply(gv, x, False)), x

        cases.append((f"Grapher N={n} C={c} (pallas bf16)", grapher))

        def ffn(B, n=n, c=c):
            x = jnp.asarray(rng.randn(B, n, c)).astype(jnp.bfloat16)
            f = FFN(features=c, hidden=4 * c, dtype=jnp.bfloat16)
            fv = f.init(jax.random.key(0), x, False)
            return (lambda x: f.apply(fv, x, False)), x

        cases.append((f"FFN N={n} C={c} bf16", ffn))

    header = f"{'component':34s}" + "".join(
        f"  B={b:<4d} us/it" for b in BATCHES
    ) + "  ratio"
    print(header, flush=True)
    for name, make in cases:
        us = []
        for b in BATCHES:
            u, cs = timed(name, make, b)
            us.append(u)
        ratio = us[-1] / us[0]
        flag = "  <-- ANTI-SCALES" if ratio > 1.15 else ""
        print(f"{name:34s}" + "".join(f"  {u:10.1f}" for u in us)
              + f"  {ratio:5.2f}{flag}", flush=True)


if __name__ == "__main__":
    main()
