"""Headline benchmark: fingerprint-generation throughput per chip.

Measures the full production path raw-audio -> log-mel -> PeakEmbed ->
GraphEncoder -> projector -> 128-d fingerprint on the default backend
(the real TPU under the driver; CPU elsewhere), steady-state, at BATCH
below, bfloat16 matmul inputs with f32 accumulation.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Operational contract (round-2 postmortem: BENCH_r02.json rc=124,
parsed=null - the two static-length scan compiles overran the driver's
wall clock and ZERO evidence was captured):
  * ONE compiled executable - the timing loop's length is a traced
    scalar (utils/profiling.py:IterTimer), so both measurement lengths
    share a single compile.
  * staged emission - a provisional throughput number exists right
    after the first timed run; SIGTERM/SIGALRM print the best number so
    far and exit, so the JSON line survives any timeout.
  * wall-clock budget - GRAFT_BENCH_BUDGET_S (default 480 s) arms a
    SIGALRM backstop; measurement stages also check the budget and fall
    back rather than start work they cannot finish.

Timing methodology: the remote-TPU transport adds a fixed ~30-45 ms
dispatch+fetch round trip per timed call, so per-batch time is measured
as the DIFFERENCE between two loop lengths - fixed costs cancel
exactly; the checksum carried through the loop both fences execution
and defeats DCE/hoisting, and every dispatch is value-unique so the
transport cannot serve a cached result (CLAUDE.md dedup note). The
provisional single-run fallback instead subtracts the nominal
GRAFT_BENCH_OVERHEAD_S (default 0.031 s measured round trip).

vs_baseline: anchored to a MEASURED number (BASELINE.md "Measured
reference-throughput anchor"): the reference torch model runs at
5.39 fp/s on one host CPU core (scripts/measure_torch_baseline.py).
Extrapolating the measured workload efficiency to a V100-class GPU
gives ~550 fp/s; the 2,000 fp/s baseline below deliberately grants the
reference several times its measured efficiency, so vs_baseline is a
floor. Perf surface being claimed against: the reference forward,
/root/reference/encoder/graph_encoder.py:167-188.
"""

import json
import os
import signal
import sys
import time

REF_FPS_BASELINE = 2000.0  # measured-anchored, generous; see docstring
BATCH = 128  # throughput sweet spot on v5e (flat 68-72 us/item for
             # B in [32, 512] since the fused MRConv frontend; B=128 peaks)
ITERS_LO, ITERS_HI, REPS = 8, 48, 3

_RESULT = {}          # best JSON payload so far (staged emission)
_EMITTED = False


def _emit():
    """Print the ONE JSON line (best result so far), exactly once."""
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    payload = _RESULT or {
        "metric": "fingerprints_per_sec_per_chip",
        "value": None,
        "unit": "fingerprints/s",
        "vs_baseline": None,
        "note": "no timed run completed before timeout",
    }
    sys.stdout.write(json.dumps(payload) + "\n")
    sys.stdout.flush()


def _on_signal(signum, frame):
    sys.stderr.write(f"[bench] signal {signum}: emitting best result\n")
    sys.stderr.flush()
    _emit()
    os._exit(0)


def _record(fps: float, note: str) -> None:
    _RESULT.clear()
    _RESULT.update({
        "metric": "fingerprints_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "fingerprints/s",
        "vs_baseline": round(fps / REF_FPS_BASELINE, 3),
        "note": note,
    })


def main():
    budget_s = float(os.environ.get("GRAFT_BENCH_BUDGET_S", 480))
    nominal_overhead_s = float(os.environ.get("GRAFT_BENCH_OVERHEAD_S", 0.031))
    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGALRM, _on_signal)
    signal.alarm(max(int(budget_s), 1))
    t_start = time.monotonic()

    import jax
    import jax.numpy as jnp

    from grafp_tpu.core.config import Config
    from grafp_tpu.dsp.melspec import LogMelConfig, log_mel_spectrogram
    from grafp_tpu.models import build_model
    from grafp_tpu.utils.profiling import IterTimer

    backend = jax.default_backend()
    cfg = Config(compute_dtype="bfloat16" if backend == "tpu" else "float32")
    model = build_model(cfg)
    mcfg = LogMelConfig.from_config(cfg)

    variables = model.init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, cfg.n_mels, cfg.n_frames), jnp.float32),
        False,
    )
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    def fingerprint(waves):
        spec = log_mel_spectrogram(waves, mcfg)
        _, z = model.apply(
            {"params": params, "batch_stats": batch_stats}, spec, False
        )
        return z

    lo, hi = (ITERS_LO, ITERS_HI) if backend == "tpu" else (1, 3)
    waves = jax.random.normal(
        jax.random.key(1), (BATCH, cfg.clip_frames), jnp.float32
    )

    timer = IterTimer(fingerprint, waves)

    # Stage 1: compile + first run (the only compile in the program).
    t0 = time.monotonic()
    t_first = timer.run(hi)
    compile_s = time.monotonic() - t0

    # Stage 2: one steady-state run -> provisional number that survives
    # a timeout (single-run estimate, nominal overhead subtracted).
    t_single = timer.run(hi)
    fps_single = BATCH * hi / max(t_single - nominal_overhead_s, 1e-9)
    _record(fps_single, f"single-run estimate ({hi} iters)")
    sys.stderr.write(
        f"[bench] backend={backend} batch={BATCH} compile={compile_s:.1f}s "
        f"provisional={fps_single:.0f} fp/s (single run)\n"
    )
    sys.stderr.flush()

    # Stage 3: overhead-cancelled two-length measurement, budget-aware.
    # Expected cost: (2*REPS - 1) short dispatches; each check gates the
    # next dispatch so we degrade to fewer reps instead of overrunning.
    times = {lo: float("inf"), hi: t_single}
    deadline = t_start + budget_s - 5.0
    for _ in range(REPS):
        for iters in (lo, hi):
            # gate on the PROJECTED finish time (a dispatch can be tens
            # of seconds on slow backends; don't lean on the alarm)
            if time.monotonic() + 1.2 * t_single * iters / hi > deadline:
                break
            times[iters] = min(times[iters], timer.run(iters))
    if times[lo] < times[hi]:          # sane diff; else keep provisional
        per_iter = (times[hi] - times[lo]) / (hi - lo)
        overhead = times[lo] - per_iter * lo
        fps = BATCH / per_iter
        _record(fps, "overhead-cancelled two-length measurement")
        sys.stderr.write(
            f"[bench] steady={per_iter*1e3:.2f}ms/batch "
            f"(fixed dispatch+fetch overhead excluded: "
            f"{overhead*1e3:.1f}ms) -> {fps:.0f} fp/s\n"
        )
        sys.stderr.flush()

    signal.alarm(0)
    _emit()


if __name__ == "__main__":
    main()
