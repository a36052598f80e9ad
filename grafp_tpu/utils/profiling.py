"""Tracing / profiling hooks (SURVEY.md §5: the reference has none
beyond wall-clock prints; this is a first-class subsystem here).

* StepTimer: steady-state step timing with correct device fencing - on
  the remote-TPU transport ``block_until_ready`` can return before
  execution finishes, so the timer syncs by FETCHING a scalar that is
  data-dependent on the step's outputs (see bench.py).
* trace(): context manager around jax.profiler.trace when a profile dir
  is requested (TENSORBOARD-viewable), no-op otherwise.
* ThroughputMeter: fingerprints/sec accounting for the fp builders.
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def fence(tree) -> float:
    """Force completion of all arrays in `tree`; returns a checksum."""
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    if not leaves:
        return 0.0
    acc = 0.0
    for leaf in leaves:
        flat = jnp.ravel(leaf)
        acc += float(flat[0].astype(jnp.float32)) if flat.size else 0.0
    return acc


class StepTimer:
    """Rolling step timing: `with timer.step(): ...` then stats()."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times = []

    @contextlib.contextmanager
    def step(self, outputs=None):
        t0 = time.perf_counter()
        yield
        if outputs is not None:
            fence(outputs)
        self.times.append(time.perf_counter() - t0)
        if len(self.times) > self.window:
            self.times.pop(0)

    def record(self, seconds: float) -> None:
        self.times.append(seconds)
        if len(self.times) > self.window:
            self.times.pop(0)

    def stats(self) -> Dict[str, float]:
        if not self.times:
            return {}
        a = np.asarray(self.times)
        return {
            "mean_s": float(a.mean()),
            "p50_s": float(np.percentile(a, 50)),
            "p90_s": float(np.percentile(a, 90)),
            "last_s": float(a[-1]),
        }


def scan_time_per_iter(
    body,
    x,
    iters_lo: int = 8,
    iters_hi: int = 40,
    reps: int = 3,
) -> Dict[str, float]:
    """Steady-state per-iteration seconds of ``body(x) -> array``.

    Times a jitted ``lax.scan`` of the body at TWO static lengths and
    reports ``(t_hi - t_lo) / (iters_hi - iters_lo)``. The difference
    cancels every fixed cost exactly - dispatch, the remote-transport
    round trip of the result fetch, scalar-transfer latency - which on
    the tunneled TPU is tens of milliseconds and otherwise pollutes
    short measurements (measured: ~30-45 ms, enough to masquerade as
    "batch anti-scaling" when divided by iters*batch).

    The body is chained through the scan carry (out-checksum folded into
    the next iteration's input at 1e-20 scale) so XLA can neither hoist
    it as loop-invariant nor dedup identical dispatches. Each length is
    timed `reps` times and the MINIMUM taken (transport noise is strictly
    additive).
    """
    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(x, s0, iters):
        def step(c, i):
            out = body(jax.tree.map(lambda a: a * (1 + c * 1e-20), x))
            # checksum over EVERY output element: anything less lets XLA
            # dead-code-eliminate untouched rows
            return jnp.sum(out).astype(jnp.float32) * 1e-20 + c, None

        s, _ = jax.lax.scan(step, s0, jnp.arange(iters))
        return s

    s0 = jnp.float32(0)
    times = {}
    compile_s = 0.0
    for iters in (iters_lo, iters_hi):
        t0 = time.perf_counter()
        float(run(x, s0, iters))                       # compile + first run
        compile_s += time.perf_counter() - t0
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(x, s0, iters))                   # fetch = the fence
            best = min(best, time.perf_counter() - t0)
        times[iters] = best
    per_iter = (times[iters_hi] - times[iters_lo]) / (iters_hi - iters_lo)
    overhead = times[iters_lo] - per_iter * iters_lo
    return {
        "per_iter_s": per_iter,
        "fixed_overhead_s": overhead,
        "compile_s": compile_s,
    }


@contextlib.contextmanager
def trace(profile_dir: Optional[str] = None):
    """jax.profiler trace when profile_dir given; no-op otherwise."""
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            yield
    else:
        yield


class ThroughputMeter:
    def __init__(self):
        self.t0 = time.perf_counter()
        self.items = 0

    def add(self, n: int) -> None:
        self.items += n

    def rate(self) -> float:
        dt = time.perf_counter() - self.t0
        return self.items / dt if dt > 0 else 0.0
