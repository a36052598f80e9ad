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
