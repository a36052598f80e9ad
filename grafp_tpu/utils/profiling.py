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
import itertools
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


class IterTimer:
    """One-compile, dedup-proof loop timer for ``body(x) -> array``.

    Compiles a SINGLE executable whose loop length is a traced scalar
    (``lax.fori_loop`` with a dynamic bound), so timing at several
    lengths never recompiles - round 2's two static-length ``lax.scan``
    compiles of the heaviest program in the repo blew the driver's
    wall-clock budget (BENCH_r02.json: rc=124, parsed=null).

    Dedup defense (the remote TPU may serve a repeated dispatch of an
    identical (executable, inputs) pair from cache - CLAUDE.md): every
    ``run()`` call draws a fresh carry seed from a monotone counter, and
    the body input is folded through the carry, so no two dispatches are
    value-identical.

    The body is chained through the loop carry (out-checksum folded into
    the next iteration's input at 1e-20 scale) so XLA can neither hoist
    it as loop-invariant nor elide iterations; the checksum covers EVERY
    output element, so nothing is dead-code-eliminated. Timing syncs by
    FETCHING the carry (``block_until_ready`` is not a reliable fence on
    the remote transport).
    """

    def __init__(self, body, x):
        @jax.jit
        def run(x, s0, iters):
            def step(i, c):
                out = body(jax.tree.map(lambda a: a * (1 + c * 1e-20), x))
                return jnp.sum(out).astype(jnp.float32) * 1e-20 + c

            return jax.lax.fori_loop(0, iters, step, s0)

        self._run = run
        self._x = x
        self._seq = itertools.count()

    def run(self, iters: int) -> float:
        """One timed dispatch at ``iters`` loop iterations; returns
        wall seconds including the fixed dispatch+fetch round trip."""
        s0 = jnp.float32(next(self._seq))       # value-unique per dispatch
        t0 = time.perf_counter()
        float(self._run(self._x, s0, jnp.int32(iters)))   # fetch = fence
        return time.perf_counter() - t0


def scan_time_per_iter(
    body,
    x,
    iters_lo: int = 8,
    iters_hi: int = 40,
    reps: int = 3,
) -> Dict[str, float]:
    """Steady-state per-iteration seconds of ``body(x) -> array``.

    Times the IterTimer program at TWO lengths and reports
    ``(t_hi - t_lo) / (iters_hi - iters_lo)``. The difference cancels
    every fixed cost exactly - dispatch, the remote-transport round trip
    of the result fetch, scalar-transfer latency - which on the tunneled
    TPU is tens of milliseconds and otherwise pollutes short
    measurements (measured: ~30-45 ms, enough to masquerade as "batch
    anti-scaling" when divided by iters*batch).

    Each length is timed `reps` times and the MINIMUM taken (transport
    noise is strictly additive). Both lengths share ONE compile (dynamic
    loop bound) and every dispatch is value-unique (see IterTimer).
    """
    timer = IterTimer(body, x)
    t0 = time.perf_counter()
    timer.run(iters_hi)                          # compile + first run
    compile_s = time.perf_counter() - t0
    times = {}
    for iters in (iters_lo, iters_hi):
        times[iters] = min(timer.run(iters) for _ in range(reps))
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
