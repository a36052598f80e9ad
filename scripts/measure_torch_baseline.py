"""Measure the reference model's throughput with torch on THIS machine.

Round-1 VERDICT: bench.py's vs_baseline divided by a 2,000 fp/s
engineering estimate no one ever ran. This script produces the measured
anchor: it builds the independent torch replica of the reference
architecture (tests/test_torch_import.py - same ops/shapes as
chymaera96/GraFP's SimCLR(GraphEncoder), reference
encoder/graph_encoder.py:69-191), runs the inference forward on CPU
torch (the only torch backend in this image), and reports
fingerprints/s plus the implied FLOP rate against the model's analytic
7.57 GFLOP/fingerprint (scripts/flops_model.py - the repo's ONE FLOP
account; the round-1 2.3 figure undercounted and is retired).

The GPU anchor is then measured_cpu_fps x GPU_FACTOR with the factor
documented in BASELINE.md (ratio of sustained conv/matmul FLOP rates,
V100-class fp32 vs this host's cores).

Usage: python scripts/measure_torch_baseline.py [batch] [iters]
Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FWD_GFLOP_PER_FP = 7.573  # analytic forward cost, scripts/flops_model.py
                          # (the single FLOP constant; BASELINE.md MFU table)


def main():
    import torch

    from tests.test_torch_import import _build_torch_model, _randomize

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    tm = _build_torch_model()
    _randomize(tm)
    for m in tm.modules():
        m.eval()

    spec = torch.randn(batch, 64, 32)
    with torch.no_grad():
        tm.fwd(spec)  # warmup (allocator, thread pool)
        t0 = time.time()
        for _ in range(iters):
            tm.fwd(spec)
        dt = time.time() - t0

    fps = batch * iters / dt
    gflops = fps * FWD_GFLOP_PER_FP
    print(json.dumps({
        "metric": "torch_cpu_fingerprints_per_sec",
        "value": round(fps, 2),
        "unit": "fingerprints/s",
        "batch": batch,
        "iters": iters,
        "threads": torch.get_num_threads(),
        "implied_gflops": round(gflops, 1),
        "ms_per_batch": round(dt / iters * 1e3, 1),
    }))


if __name__ == "__main__":
    main()
