"""Stand up a synthetic ICASSP-protocol workspace for the REAL CLIs.

The round-2 verdict's gap #3: the reference contract (train.py ->
test_fp.py, the icassp.sh sweep) had only been rehearsed at toy scale on
CPU and via library APIs on the TPU - never through the actual CLI
drivers on the chip. This script plays the role of the reference's
setup_icassp.py (/root/reference/setup_icassp.py:19-35) for an
environment with no fma/MUSAN audio: it synthesizes corpora
(tests/fixtures.py melodic tracks), writes the config YAML, the frozen
`<name>_indices.npy` split (reference test_fp.py:244-252 contract), and
the test_config epoch matrix - after which `icassp.sh`-shaped sweeps run
through the UNMODIFIED CLI entry points.

Usage:
  python scripts/setup_synth_icassp.py --root /tmp/grafp_cli_e2e \
      [--train_tracks 400] [--eval_tracks 2400] [--dur 20]
Then:
  bash scripts/e2e_cli_icassp.sh /tmp/grafp_cli_e2e
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np
import yaml


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/grafp_cli_e2e")
    ap.add_argument("--train_tracks", type=int, default=400)
    ap.add_argument("--eval_tracks", type=int, default=2400)
    ap.add_argument("--dur", type=float, default=20.0)
    ap.add_argument("--bsz", type=int, default=128)
    ap.add_argument("--n_query_db", type=int, default=200)
    ap.add_argument("--tiny", action="store_true", default=False,
                    help="1 kHz / 16-mel geometry + f32 for cheap CPU "
                         "plumbing checks (tests/test_cli_e2e.py scale)")
    args = ap.parse_args()

    from fixtures import make_wav_dir

    fs = 1000 if args.tiny else 16000
    root = os.path.abspath(args.root)
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    for name, n, dur, seed, kind in (
        ("train_tracks", args.train_tracks, args.dur, 10, "music"),
        ("eval_tracks", args.eval_tracks, args.dur, 20, "music"),
        ("noise", 24, 5.0, 30, "noise"),
        ("ir", 12, 0.5, 40, "ir"),
    ):
        d = os.path.join(root, name)
        if not os.path.isdir(d) or len(os.listdir(d)) < n:
            print(f"[setup] generating {n} x {dur}s '{kind}' wavs -> {d}",
                  flush=True)
            make_wav_dir(d, n=n, dur_s=dur, sr=fs, seed=seed, kind=kind)

    # config: the shipped grafp.yaml schema with paths + sizes resolved
    # (the role of reference setup_config.py:5-17)
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "config", "grafp.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg.update(
        data_dir=os.path.join(root, "data"),
        train_dir=os.path.join(root, "train_tracks"),
        val_dir=os.path.join(root, "train_tracks"),
        noise_dir=os.path.join(root, "noise"),
        ir_dir=os.path.join(root, "ir"),
        train_sz=args.train_tracks,
        val_sz=args.eval_tracks,
        bsz_train=args.bsz,
    )
    if args.tiny:
        cfg.update(fs=1000, win_len=256, hop_len=128, n_mels=16, n_fft=256,
                   n_frames=8, overlap=0.5, compute_dtype="float32",
                   n_dummy=4, n_query=2)
    with open(os.path.join(root, "synth.yaml"), "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)

    # frozen eval split (reference data/fma_medium_indices.npy role):
    # seeded shuffle; dummy = all but n_query_db, query = the tail
    rng = np.random.RandomState(42)
    indices = rng.permutation(args.eval_tracks)
    np.save(os.path.join(root, "data", "eval_tracks_indices.npy"), indices)

    # test_config matrix (reference config/test_config.yaml role)
    with open(os.path.join(root, "test_config.yaml"), "w") as f:
        yaml.safe_dump({"tc_29": ["best"]}, f)

    print(f"[setup] workspace ready at {root}", flush=True)


if __name__ == "__main__":
    main()
