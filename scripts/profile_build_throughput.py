"""DB-build throughput A/B on the real chip: per-track vs packed dispatch.

Round-5 lever: the dummy-db build measured 6.3 tracks/s in the 2.19M-row
CLI rehearsal — ~9% of the model's 14.4k fp/s — because every track paid
its own upload+dispatch+fetch on the remote-attached TPU (~95 ms of
fixed round-trip vs ~14 ms of compute) and decode ran serially in the
main thread. The packed builder (fp/builder.py fingerprint_tracks /
build_pack) amortizes the round trip over K tracks and moves decode into
the overlap workers. This script measures, in ONE process:

  phase 0: host decode rate (TrackLoader __getitem__ loop)
  phase 1: packed-program compile + create_dummy_db(pack=K)
  phase 2: per-track-program compile + create_dummy_db(pack=1)  [--ab]
  phase 3: packed overlap-knob sweep (workers x inflight)       [--sweep]

Matches the reference's eval DB build (test_fp.py:127-158) at rehearsal
geometry: 20 s tracks, fs 16000, the shipped grafp.yaml model.

Usage:
  python scripts/profile_build_throughput.py [--tracks 240] [--pack 8]
      [--ab] [--sweep]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracks", type=int, default=240)
    ap.add_argument("--pack", type=int, default=8)
    ap.add_argument("--dur", type=float, default=20.0)
    ap.add_argument("--ab", action="store_true",
                    help="also measure pack=1 (second compile)")
    ap.add_argument("--sweep", action="store_true",
                    help="packed workers/inflight sweep")
    ap.add_argument("--fpdb", type=int, default=0, metavar="N",
                    help="also A/B create_fp_db (paired clean+corrupt "
                         "build) over N tracks at pack K vs pack 1")
    ap.add_argument("--root", default=None)
    args = ap.parse_args()

    import jax
    import numpy as np
    import yaml

    from fixtures import make_wav_dir

    root = args.root or tempfile.mkdtemp(prefix="build_prof_")
    wav_dir = os.path.join(root, "tracks")
    t0 = time.perf_counter()
    make_wav_dir(wav_dir, n=args.tracks, dur_s=args.dur, sr=16000,
                 seed=11, kind="music")
    print(f"[synth] {args.tracks} x {args.dur}s wavs in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    from grafp_tpu.core.config import load_config
    from grafp_tpu.data.dataset import FingerprintDataset, TrackLoader
    from grafp_tpu.fp.builder import FingerprintPipeline, create_dummy_db
    from grafp_tpu.models import build_model

    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "config", "grafp.yaml"))
    cfg["train_dir"] = cfg["val_dir"] = wav_dir
    cfg["val_sz"] = args.tracks
    cfg["data_dir"] = root  # isolate the index cache from repo data/

    ds = FingerprintDataset(cfg, path=wav_dir, train=False)
    idx = list(range(len(ds)))
    loader = TrackLoader(ds, idx)

    # phase 0: host-only decode rate (the serial floor of the old path)
    t0 = time.perf_counter()
    n_host = min(64, len(ds))
    for i in range(n_host):
        w = ds[i]
    dt = time.perf_counter() - t0
    print(f"[host] decode {n_host} tracks: {dt:.2f}s = "
          f"{n_host / dt:.1f} tracks/s ({1e3 * dt / n_host:.1f} ms/track)",
          flush=True)

    model = build_model(cfg)
    import jax.numpy as jnp
    v = model.init({"params": jax.random.key(0)},
                   jnp.zeros((1, cfg["n_mels"], cfg["n_frames"]),
                             jnp.float32), False)
    pipe = FingerprintPipeline(model, cfg, v["params"],
                               v.get("batch_stats", {}))

    results = {}

    def run(tag, pack):
        out = os.path.join(root, f"db_{tag}")
        os.makedirs(out, exist_ok=True)
        # compile warm-up on the first group, timed separately
        t0 = time.perf_counter()
        warm = [ds[i] for i in range(min(pack, len(ds)))]
        zs = pipe.fingerprint_tracks(warm, pack=pack)
        n_fp_track = len(zs[0])
        print(f"[{tag}] first-group (compile) "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        n, d = create_dummy_db(loader, pipe, out, verbose=False, pack=pack)
        dt = time.perf_counter() - t0
        rate = len(ds) / dt
        results[tag] = {"tracks_s": round(rate, 2),
                        "fp_s": round(n / dt, 1),
                        "wall_s": round(dt, 1), "rows": int(n)}
        print(f"[{tag}] {len(ds)} tracks -> {n} rows in {dt:.1f}s = "
              f"{rate:.2f} tracks/s, {n / dt:.0f} fp/s "
              f"(~{34600 / rate / 60:.0f} min for the 7M dummy build)",
              flush=True)
        shutil.rmtree(out, ignore_errors=True)
        return n_fp_track

    run(f"pack{args.pack}", args.pack)
    if args.ab:
        run("pack1", 1)

    if args.sweep:
        from grafp_tpu.fp.builder import (_chunks, _ordered_overlap,
                                          _track_getters)
        combos = [(args.pack, 3, 4), (args.pack, 4, 8), (args.pack, 6, 8)]
        if args.ab:  # pack1 program already compiled by the A/B phase
            combos += [(1, 4, 8), (1, 6, 8)]
        for pack, workers, inflight in combos:
            def _group(getters, _pack=pack):
                waves = [g() if callable(g) else g for g in getters]
                return pipe.fingerprint_tracks(waves, pack=_pack)

            t0 = time.perf_counter()
            rows = 0
            for zs in _ordered_overlap(
                    _group, _chunks(_track_getters(loader), pack),
                    workers=workers, inflight=inflight):
                rows += sum(len(z) for z in zs)
            dt = time.perf_counter() - t0
            tag = f"pack{pack}_w{workers}i{inflight}"
            results[tag] = {"tracks_s": round(len(ds) / dt, 2),
                            "fp_s": round(rows / dt, 1),
                            "wall_s": round(dt, 1)}
            print(f"[{tag}] {len(ds) / dt:.2f} tracks/s "
                  f"({rows / dt:.0f} fp/s)", flush=True)

    if args.fpdb:
        from grafp_tpu.data.dataset import build_augment_banks
        from grafp_tpu.fp.builder import create_fp_db

        noise_dir = os.path.join(root, "noise")
        ir_dir = os.path.join(root, "ir")
        make_wav_dir(noise_dir, n=8, dur_s=5.0, sr=16000, seed=30,
                     kind="noise")
        make_wav_dir(ir_dir, n=4, dur_s=0.5, sr=16000, seed=40, kind="ir")
        banks = build_augment_banks(
            [os.path.join(noise_dir, f) for f in sorted(os.listdir(noise_dir))],
            [os.path.join(ir_dir, f) for f in sorted(os.listdir(ir_dir))],
            cfg["fs"])
        qloader = TrackLoader(ds, idx[: args.fpdb])
        from grafp_tpu.fp.builder import track_corruption_keys
        t0 = time.perf_counter()
        warm = [ds[i] for i in range(args.pack)]
        pipe.corrupt_tracks(warm, banks, track_corruption_keys(0, args.pack),
                            pack=args.pack)
        print(f"[fpdb] corrupt-program compile "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        for tag, pk in ((f"fpdb_pack{args.pack}", args.pack),
                        ("fpdb_pack1", 1)):
            out = os.path.join(root, tag)
            os.makedirs(out, exist_ok=True)
            t0 = time.perf_counter()
            n, d = create_fp_db(qloader, pipe, banks, out, seed=0,
                                verbose=False, pack=pk)
            dt = time.perf_counter() - t0
            results[tag] = {"tracks_s": round(args.fpdb / dt, 2),
                            "wall_s": round(dt, 1), "rows": int(n)}
            print(f"[{tag}] {args.fpdb} tracks (clean+corrupt pairs) in "
                  f"{dt:.1f}s = {args.fpdb / dt:.2f} tracks/s "
                  f"(~{400 * dt / args.fpdb / 60:.1f} min per 400-track "
                  f"query build)", flush=True)
            shutil.rmtree(out, ignore_errors=True)

    print(json.dumps(results))
    if args.root is None:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
