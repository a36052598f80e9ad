"""int8_static retrieval-level sign-off (VERDICT r4 next #4).

Round 4 promoted serve_quant='int8_static' on a 1.050x serving-speed win
with fingerprint cos min 0.983 vs bf16 — a cosine number, not a
retrieval measurement. This runs the synthetic protocol sweep (the
round-2 melodic corpus scale the verdict deems sufficient) with the SAME
trained checkpoint under bf16 and int8_static at SNR {10, 5, 0} and
reports top-1 exact / top-1 near / top-3 hit-rate deltas, replacing the
"needs a fidelity sign-off per deployment" caveat with a number.

Protocol identical to the CLI driver (cli/test_fp_main.py, reference
test_fp.py:87-158 + eval.py:170-332): frozen `<dir>_indices.npy` split,
n_query_db query tracks, paired clean-db/corrupted-query builds with the
test-split noise/IR banks, ivfpq index, seeded test ids — run in ONE
process so the embed programs compile once per quant mode instead of
once per (mode, SNR) CLI row. The A/B is controlled: same checkpoint,
same corruption key sequence (seed), same seeded test ids; the only
variable is the serving quantization.

Prereqs (the round-5 rehearsal workspace):
  python scripts/setup_synth_icassp.py --root /tmp/grafp_cli_e2e_r5 \
      --train_tracks 400 --eval_tracks 1200 --dur 20
  # train tc29r5 in $ROOT/run (scripts/e2e_cli_icassp_r5.sh train step)
Run (alone on the chip; int8 compiles are slow):
  python scripts/e2e_int8_retrieval_signoff.py [--root /tmp/grafp_cli_e2e_r5]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/grafp_cli_e2e_r5")
    ap.add_argument("--ckp", default="tc29r5")
    ap.add_argument("--n_query_db", type=int, default=200)
    ap.add_argument("--test_ids", default="400")
    ap.add_argument("--snrs", type=int, nargs="+", default=[10, 5, 0])
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    import numpy as np

    from grafp_tpu.core.config import load_config
    from grafp_tpu.data.dataset import (
        FingerprintDataset, TrackLoader, build_augment_banks,
    )
    from grafp_tpu.data.indexing import load_augmentation_index
    from grafp_tpu.fp.builder import (
        FingerprintPipeline, create_dummy_db, create_fp_db,
    )
    from grafp_tpu.models import build_model
    from grafp_tpu.retrieval.evaluate import eval_faiss
    from grafp_tpu.train.checkpoint import load_ckp

    root = os.path.abspath(args.root)
    cfg = load_config(os.path.join(root, "synth_eval.yaml"))
    ckp_dir = os.path.join(root, "run", "checkpoint",
                           f"model_{args.ckp}_best")
    payload = load_ckp(ckp_dir)
    print(f"checkpoint: {ckp_dir} (epoch {payload.get('epoch')})",
          flush=True)

    # the CLI's frozen-split contract (cli/test_fp_main.py:166-173)
    dataset = FingerprintDataset(cfg, path=os.path.join(root, "eval_tracks"),
                                 train=False)
    indices = np.load(os.path.join(cfg["data_dir"],
                                   "eval_tracks_indices.npy"))
    split1 = len(dataset) - args.n_query_db
    dummy_loader = TrackLoader(dataset, indices[:split1])
    query_loader = TrackLoader(dataset, indices[split1:])
    print(f"dummy {len(dummy_loader)} tracks, query {len(query_loader)} "
          f"tracks", flush=True)

    noise_test = load_augmentation_index(cfg["noise_dir"], splits=0.8)["test"]
    ir_test = load_augmentation_index(cfg["ir_dir"], splits=0.8)["test"]
    banks = build_augment_banks(noise_test, ir_test, cfg["fs"])

    results = {}
    for quant in ("bf16", "int8_static"):
        qcfg = load_config(os.path.join(root, "synth_eval.yaml"))
        if quant != "bf16":
            qcfg["serve_quant"] = quant
        model = build_model(qcfg)
        pipe = FingerprintPipeline(model, qcfg, payload["params"],
                                   payload["batch_stats"])
        dummy_dir = os.path.join(root, "signoff", quant, "dummy")
        t0 = time.time()
        create_dummy_db(dummy_loader, pipe, dummy_dir, verbose=False)
        print(f"[{quant}] dummy db built in {time.time()-t0:.0f}s",
              flush=True)
        for snr in args.snrs:
            # corrupt_track reads self._val_snr per call; only the small
            # augment program re-traces, the embed programs stay cached
            pipe._val_snr = (float(snr), float(snr))
            fp_dir = os.path.join(root, "signoff", quant, f"snr{snr}")
            t0 = time.time()
            create_fp_db(query_loader, pipe, banks, fp_dir, seed=args.seed,
                         ir_prob=1.0, verbose=False)
            hr = eval_faiss(
                emb_dir=fp_dir, emb_dummy_dir=dummy_dir,
                index_type="ivfpq", nogpu=True, test_ids=args.test_ids,
                test_seq_len="1 3 5 9 11 19", verbose=False,
                scan_topk=qcfg.scan_topk, scan_recall=qcfg.scan_recall,
            )
            results[(quant, snr)] = np.asarray(hr, np.float64)
            print(f"[{quant}] SNR {snr:>2}: top1-exact "
                  f"{np.round(hr[0], 2)} top1-near {np.round(hr[1], 2)} "
                  f"top3 {np.round(hr[2], 2)} ({time.time()-t0:.0f}s)",
                  flush=True)

    # ---- deltas (int8_static - bf16), percentage points ----
    print("\n==== int8_static - bf16 hit-rate deltas (pp; "
          "seq lens 1 3 5 9 11 19) ====", flush=True)
    summary = {}
    for snr in args.snrs:
        d = results[("int8_static", snr)] - results[("bf16", snr)]
        print(f"SNR {snr:>2}: top1-exact {np.round(d[0], 2)}\n"
              f"        top1-near  {np.round(d[1], 2)}\n"
              f"        top3       {np.round(d[2], 2)}", flush=True)
        summary[str(snr)] = {
            "top1_exact_delta_pp": [float(x) for x in d[0]],
            "top1_near_delta_pp": [float(x) for x in d[1]],
            "top3_delta_pp": [float(x) for x in d[2]],
            "bf16_top1_exact": [float(x) for x in results[("bf16", snr)][0]],
        }
    worst = min(min(v["top1_exact_delta_pp"] + v["top3_delta_pp"])
                for v in summary.values())
    print(json.dumps({"signoff": "int8_static_vs_bf16",
                      "worst_delta_pp": worst, "per_snr": summary}),
          flush=True)


if __name__ == "__main__":
    main()
