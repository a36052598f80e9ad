"""Analytic FLOP account of the flagship fingerprint forward.

Grounds the MFU / speed-of-light analysis in BASELINE.md: per-item FLOPs
by component for the grafp 't' geometry (N 1024->512->256->128, C
64->128->256->512, 12 Grapher+FFN blocks), the v5e bf16 ceiling, and the
fp/s implied at various MFU levels.

Counting convention: 1 MAC = 2 FLOPs; elementwise ops ignored (they are
bandwidth, not FLOPs). Run: python scripts/flops_model.py
"""

import sys

V5E_BF16_TFLOPS = 197.0  # TPU v5e peak, bf16 matmul, per chip
V5E_F32_TFLOPS = 49.0    # approx f32 MXU rate (bf16x3-pass emulation)
V5E_HBM_GBS = 819.0

BLOCKS = (2, 2, 6, 2)
CHANNELS = (64, 128, 256, 512)
N0 = 1024
K = 3
EMB = 1024
D, U = 128, 32


def grapher_flops(n, c):
    fc1 = 2 * n * c * c
    scores = 2 * n * n * c
    extract = K * 2 * n * n * c          # k one-hot-matmul rounds
    mrconv = 2 * n * (2 * c) * (2 * c) // 4  # grouped(4) pointwise
    fc2 = 2 * n * (2 * c) * c
    return dict(fc1=fc1, scores=scores, extract=extract,
                mrconv=mrconv, fc2=fc2)


def ffn_flops(n, c):
    return dict(ffn=2 * 2 * n * c * (4 * c))


def main():
    total = {}
    n = N0
    per_stage = []
    for i, (nb, c) in enumerate(zip(BLOCKS, CHANNELS)):
        if i > 0:
            n //= 2
            c_prev = CHANNELS[i - 1]
            total["downsample"] = total.get("downsample", 0) + \
                2 * n * 3 * c_prev * c
        stage = 0
        for _ in range(nb):
            for k, v in grapher_flops(n, c).items():
                total[k] = total.get(k, 0) + v
                stage += v
            for k, v in ffn_flops(n, c).items():
                total[k] = total.get(k, 0) + v
                stage += v
        per_stage.append((i + 1, n, c, stage))

    total["stem"] = 2 * N0 * 8 * CHANNELS[0]
    total["proj"] = 2 * (N0 // 8) * CHANNELS[-1] * EMB
    total["projector"] = 2 * (EMB * D * U + D * U * D)
    # log-mel GEMM-native DFT: 32 frames x n_fft=1024 x 513 bins x {cos,sin}
    total["logmel_dft"] = 2 * 32 * 1024 * 513 * 2
    total["logmel_mel"] = 2 * 32 * 513 * 64
    # peak embed conv: 7x7x3 -> 8 on (64, 32) / stride (2,1)
    total["peak_conv"] = 2 * 32 * 32 * 7 * 7 * 3 * 8

    tot = sum(total.values())
    print(f"{'component':12s} {'GFLOP/item':>11s} {'share':>6s}")
    for k, v in sorted(total.items(), key=lambda kv: -kv[1]):
        print(f"{k:12s} {v/1e9:11.3f} {100*v/tot:5.1f}%")
    print(f"{'TOTAL':12s} {tot/1e9:11.3f}")
    print()
    for s, n_, c_, v in per_stage:
        print(f"stage {s} (N={n_:4d} C={c_:3d}): {v/1e9:.3f} GFLOP/item")
    print()
    sol = V5E_BF16_TFLOPS * 1e12 / tot
    print(f"speed of light (100% bf16 MFU): {sol:,.0f} fp/s/chip")
    for mfu in (0.5, 0.4, 0.3, 0.2, 0.1):
        print(f"  at {mfu:.0%} MFU: {sol*mfu:,.0f} fp/s")
    for fps in (6600, 9500, 15000, 20000):
        print(f"  {fps:,} fp/s implies {fps*tot/1e12:.1f} TFLOP/s "
              f"= {fps*tot/(V5E_BF16_TFLOPS*1e12):.1%} bf16 MFU")


if __name__ == "__main__":
    sys.exit(main())
