"""Full-system validation at production geometry on the real TPU.

Synthetic stand-in for the ICASSP protocol (no fma/MUSAN audio in this
environment): generate distinct synthetic "music" tracks + noise + IR
corpora at 16 kHz, train the flagship model briefly with the real train
step, then run the tc_29-geometry evaluation (overlap 0.9, 1-s segments,
paired clean-db/corrupted-query, ivfpq + exact indexes, SNR sweep) and
print hit-rate tables.

Run: python scripts/e2e_synthetic_icassp.py [--tracks 300] [--epochs 20]
Writes everything under /tmp/grafp_e2e.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_corpora(root, n_tracks, dur_s, fs=16000, seed=0):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from fixtures import make_wav_dir

    t0 = time.time()
    make_wav_dir(os.path.join(root, "tracks"), n=n_tracks, dur_s=dur_s,
                 sr=fs, seed=seed, kind="music")
    make_wav_dir(os.path.join(root, "noise"), n=24, dur_s=5.0, sr=fs,
                 seed=seed + 1, kind="noise")
    make_wav_dir(os.path.join(root, "ir"), n=12, dur_s=0.5, sr=fs,
                 seed=seed + 2, kind="ir")
    print(f"[data] {n_tracks} tracks + corpora in {time.time()-t0:.0f}s",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracks", type=int, default=300)
    ap.add_argument("--dur", type=float, default=15.0)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--bsz", type=int, default=64)
    ap.add_argument("--queries", type=int, default=40)
    ap.add_argument("--root", default="/tmp/grafp_e2e")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from grafp_tpu.core.config import Config
    from grafp_tpu.data.dataset import (
        FingerprintDataset, PairBatcher, TrackLoader, build_augment_banks,
    )
    from grafp_tpu.data.indexing import load_augmentation_index
    from grafp_tpu.fp.builder import (
        FingerprintPipeline, create_dummy_db, create_fp_db,
    )
    from grafp_tpu.models import build_model
    from grafp_tpu.retrieval.evaluate import eval_faiss
    from grafp_tpu.train import create_train_state, make_train_step

    os.makedirs(args.root, exist_ok=True)
    if not os.path.exists(os.path.join(args.root, "tracks")):
        make_corpora(args.root, args.tracks, args.dur)

    # tc_29 geometry: offset .05, overlap .9 (reference test_fp.py:189-191)
    cfg = Config(
        data_dir=args.root,
        train_dir=os.path.join(args.root, "tracks"),
        val_dir=os.path.join(args.root, "tracks"),
        noise_dir=os.path.join(args.root, "noise"),
        ir_dir=os.path.join(args.root, "ir"),
        offset=0.05, overlap=0.9,
        train_sz=args.tracks, val_sz=args.tracks,
        bsz_train=args.bsz, compute_dtype="bfloat16",
    )

    noise = load_augmentation_index(cfg["noise_dir"], splits=0.8)
    irs = load_augmentation_index(cfg["ir_dir"], splits=0.8)
    train_banks = build_augment_banks(noise["train"], irs["train"], cfg.fs)
    test_banks = build_augment_banks(noise["test"], irs["test"], cfg.fs)

    model = build_model(cfg)
    ds = FingerprintDataset(cfg, cfg.train_dir, train=True, seed=0)
    loader = PairBatcher(ds, args.bsz, seed=0, num_threads=2)
    state = create_train_state(model, cfg, jax.random.key(0),
                               max(len(loader), 1))
    step = make_train_step(model, cfg, train_banks)

    print(f"[train] {args.epochs} epochs x {len(loader)} steps "
          f"(bsz {args.bsz})", flush=True)
    for epoch in range(args.epochs):
        t0 = time.time()
        losses = []
        for i, (xi, xj) in enumerate(loader):
            state, m = step(state, jnp.asarray(xi), jnp.asarray(xj),
                            jax.random.fold_in(jax.random.key(epoch), i))
            losses.append(float(m["loss"]))
        print(f"[train] epoch {epoch}: loss {np.mean(losses):.4f} "
              f"({time.time()-t0:.0f}s)", flush=True)

    # ---- evaluation protocol ----
    eval_ds = FingerprintDataset(cfg, cfg.train_dir, train=False)
    idx = np.arange(len(eval_ds))
    dummy_loader = TrackLoader(eval_ds, idx[: len(idx) - args.queries])
    query_loader = TrackLoader(eval_ds, idx[len(idx) - args.queries:])
    pipe = FingerprintPipeline(model, cfg, state.params, state.batch_stats,
                               bucket_s=args.dur)

    for snr in (10, 5, 0):
        cfg["val_snr"] = [snr, snr]
        pipe_snr = FingerprintPipeline(model, cfg, state.params,
                                       state.batch_stats, bucket_s=args.dur)
        fp_dir = os.path.join(args.root, f"fp_snr{snr}")
        t0 = time.time()
        create_dummy_db(dummy_loader, pipe_snr, fp_dir, verbose=False)
        create_fp_db(query_loader, pipe_snr, test_banks, fp_dir,
                     verbose=False)
        print(f"[fp] SNR {snr}: DBs built in {time.time()-t0:.0f}s",
              flush=True)
        for index_type in ("ivfpq", "l2"):
            hr = eval_faiss(fp_dir, index_type=index_type, nogpu=True,
                            test_ids="200", test_seq_len="1 3 5 11 19",
                            n_centroids=64, verbose=False)
            print(f"[eval] SNR {snr} {index_type}: top1-exact "
                  f"{np.round(hr[0], 1)}  top1-near {np.round(hr[1], 1)} "
                  f"top3 {np.round(hr[2], 1)}", flush=True)


if __name__ == "__main__":
    main()
