"""Measure the end-to-end training INPUT pipeline (VERDICT r4 next #1).

The reference feeds its GPU with DataLoader(batch_size=256, shuffle=True,
num_workers=8) running decode -> mono -> resample -> crop -> CPU augment
in worker processes (/root/reference/train.py:124-127,
modules/data.py:45-57) — SURVEY §7 ranks input throughput a top-5 hard
part because that pipeline is the reference's own bottleneck. Here the
augment runs on-device inside the jitted step, so the host only has to
decode+resample+crop; this script measures what that host side actually
sustains on an mp3 corpus (fma's format, 44.1 kHz like fma's masters)
and what each cache mode buys:

  stage micro-rates   decode (libmpg123), sinc resample 44.1k->16k,
                      crop+norm — tracks/s each, 1 thread
  PairBatcher epochs  sustained pairs/s per epoch for
                        (a) no cache        (re-decode every epoch,
                                             the reference's behavior)
                        (b) cache_decoded   (RAM dict; epoch 2+ warm)
                        (c) cache_dir       (disk npy + memmap; epoch 2+
                                             warm AND a fresh process is
                                             warm from epoch 1)
  verdict             each mode vs the measured device train step
                      (200.2 ms / 256 pairs = 1,279 pairs/s on v5e):
                      feed_rate / device_rate < 1 means input-bound.

Usage:
  python scripts/profile_input_pipeline.py [--root /tmp/grafp_input_prof]
      [--tracks 384] [--dur 30] [--bsz 128] [--skip-synth]

The corpus is reused across runs (synthesis + lame encode are slow on
this 1-core host); delete --root to rebuild.
"""

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np

DEVICE_PAIRS_PER_S = 1279.0  # measured: 200.2 ms / 256-pair step (r4)


def build_corpus(root: str, n: int, dur: float, sr_master: int) -> str:
    from fixtures import _melody
    from grafp_tpu.native import mp3_native

    d = os.path.join(root, "mp3_tracks")
    os.makedirs(d, exist_ok=True)
    have = len([f for f in os.listdir(d) if f.endswith(".mp3")])
    if have >= n:
        print(f"[corpus] reusing {have} mp3 tracks in {d}")
        return d
    rng = np.random.RandomState(1234)
    t = np.arange(int(dur * sr_master)) / sr_master
    t0 = time.time()
    for i in range(n):
        p = os.path.join(d, f"track_{i:05d}.mp3")
        if os.path.exists(p):
            continue
        x = _melody(rng, t, sr_master)
        mp3_native.write(p, x.astype(np.float32), sr_master, kbps=128)
        if (i + 1) % 64 == 0:
            el = time.time() - t0
            print(f"[corpus] {i+1}/{n} encoded ({el:.0f}s, "
                  f"{(i+1)*dur/el:.0f}x realtime)", flush=True)
    print(f"[corpus] {n} x {dur:.0f}s mp3 @ {sr_master} Hz in "
          f"{time.time()-t0:.0f}s")
    return d


def micro_rates(track_dir: str, fs: int, n_sample: int = 24):
    from grafp_tpu.data.audio_io import load_audio
    from grafp_tpu.data.resample import resample_sinc

    paths = sorted(
        os.path.join(track_dir, f) for f in os.listdir(track_dir)
        if f.endswith(".mp3"))[:n_sample]
    t0 = time.time()
    decoded = [load_audio(p) for p in paths]
    t_dec = time.time() - t0
    t0 = time.time()
    res = [resample_sinc(x, sr, fs) for x, sr in decoded]
    t_res = time.time() - t0
    t0 = time.time()
    for x in res:
        nv = 1e-8 + np.quantile(np.abs(x), 0.95)
        _ = (x[: fs] / nv).astype(np.float32)
    t_crop = time.time() - t0
    n = len(paths)
    print(f"[micro] decode {n/t_dec:8.1f} tracks/s   "
          f"({t_dec/n*1e3:.1f} ms/track, libmpg123)")
    print(f"[micro] resample {n/t_res:6.1f} tracks/s   "
          f"({t_res/n*1e3:.1f} ms/track, sinc 44.1k->16k)")
    print(f"[micro] crop+norm {n/t_crop:5.1f} tracks/s   "
          f"({t_crop/n*1e3:.1f} ms/track)")
    full = t_dec + t_res + t_crop
    print(f"[micro] full prep {n/full:6.1f} tracks/s   (1 thread)")
    return n / full


def epoch_rate(batcher, label: str):
    t0 = time.time()
    n_pairs = 0
    for xi, xj in batcher:
        n_pairs += len(xi)
    dt = time.time() - t0
    rate = n_pairs / dt
    print(f"[epoch] {label:34s} {rate:8.1f} pairs/s "
          f"({dt:6.1f}s for {n_pairs} pairs)  "
          f"{rate/DEVICE_PAIRS_PER_S:5.2f}x device step", flush=True)
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/grafp_input_prof")
    ap.add_argument("--tracks", type=int, default=384)
    ap.add_argument("--dur", type=float, default=30.0)
    ap.add_argument("--bsz", type=int, default=128)
    ap.add_argument("--master_sr", type=int, default=44100)
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--skip-synth", action="store_true")
    args = ap.parse_args()

    from grafp_tpu.core.config import Config
    from grafp_tpu.data.dataset import FingerprintDataset, PairBatcher

    track_dir = (os.path.join(args.root, "mp3_tracks") if args.skip_synth
                 else build_corpus(args.root, args.tracks, args.dur,
                                   args.master_sr))
    cfg = Config(data_dir=os.path.join(args.root, "data"),
                 train_sz=args.tracks, val_sz=args.tracks)

    micro = micro_rates(track_dir, cfg["fs"])

    results = {}

    def fresh(**kw):
        ds = FingerprintDataset(cfg, track_dir, train=True, seed=42, **kw)
        return ds, PairBatcher(ds, args.bsz, seed=42,
                               num_threads=args.threads)

    # (a) no cache: every epoch pays full decode+resample (reference mode)
    _, b = fresh()
    results["none_ep1"] = epoch_rate(b, "no cache, epoch 1")
    results["none_ep2"] = epoch_rate(b, "no cache, epoch 2")

    # (b) RAM cache
    _, b = fresh(cache_decoded=True)
    results["ram_ep1"] = epoch_rate(b, "cache_decoded (RAM), epoch 1")
    results["ram_ep2"] = epoch_rate(b, "cache_decoded (RAM), epoch 2")

    # (c) disk cache: cold build, warm epoch, then a FRESH instance
    cdir = os.path.join(args.root, "decoded_cache")
    shutil.rmtree(cdir, ignore_errors=True)
    ds, b = fresh(cache_dir=cdir)
    results["disk_ep1"] = epoch_rate(b, "cache_dir (disk), epoch 1 cold")
    results["disk_ep2"] = epoch_rate(b, "cache_dir (disk), epoch 2 warm")
    _, b2 = fresh(cache_dir=cdir)
    results["disk_fresh"] = epoch_rate(b2, "cache_dir, FRESH process ep 1")
    gb = sum(os.path.getsize(os.path.join(cdir, f))
             for f in os.listdir(cdir)) / 2**30
    print(f"[disk] cache size {gb:.2f} GiB for {args.tracks} x "
          f"{args.dur:.0f}s tracks")

    steady = results["disk_fresh"]
    bound = "INPUT-bound" if steady < DEVICE_PAIRS_PER_S else "DEVICE-bound"
    print(f"\n[verdict] steady-state feed (disk cache): {steady:.0f} pairs/s"
          f" vs device {DEVICE_PAIRS_PER_S:.0f} pairs/s -> {bound} "
          f"(x{steady/DEVICE_PAIRS_PER_S:.2f})")
    print(f"[verdict] uncached feed: {results['none_ep2']:.0f} pairs/s "
          f"(x{results['none_ep2']/DEVICE_PAIRS_PER_S:.2f} of device) — "
          f"the reference's re-decode-every-epoch mode; micro full-prep "
          f"{micro:.1f} tracks/s/thread")


if __name__ == "__main__":
    main()
