import time

import jax.numpy as jnp
import numpy as np

from grafp_tpu.utils.profiling import StepTimer, ThroughputMeter, fence, trace


def test_step_timer():
    t = StepTimer(window=3)
    for i in range(5):
        with t.step(outputs=jnp.ones(3)):
            time.sleep(0.01)
    s = t.stats()
    assert 0.005 < s["p50_s"] < 1.0
    assert len(t.times) == 3  # window respected


def test_fence_and_meter():
    assert isinstance(fence({"a": jnp.ones((2, 2))}), float)
    assert fence({}) == 0.0
    m = ThroughputMeter()
    m.add(100)
    assert m.rate() > 0


def test_trace_noop():
    with trace(None):
        pass
