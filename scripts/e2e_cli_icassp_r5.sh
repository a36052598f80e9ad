#!/bin/bash
# Round-5 rehearsal: fma_medium-EQUIVALENT scale (VERDICT r4 next #3).
# >=2M segment rows through the UNMODIFIED CLI entry points on the real
# TPU: 11,000 eval tracks x 20 s at overlap 0.9 = ~2.19M rows
# (fma_medium protocol is 24.5k dummy + 500 query tracks ~7M rows,
# /root/reference/test_fp.py:49,169-172 — this is the same pipeline at
# a 2.2x-the-round-4 scale), PUBLISHED index (ivfpq) + the promoted
# approx block scan, full SNR grid + the sanir ablation row.
#
#   python scripts/setup_synth_icassp.py --root /tmp/grafp_cli_e2e_r5 \
#       --train_tracks 400 --eval_tracks 11000 --dur 20
#   bash scripts/e2e_cli_icassp_r5.sh [ROOT] [EPOCHS]
#
# Clobber lesson (round 3): UNIQUE checkpoint/model name (tc29r5) and an
# isolated CWD ($ROOT/run) so no concurrent drive can overwrite the
# trained checkpoint or the fp-dir memmaps.

set -e
ROOT=${1:-/tmp/grafp_cli_e2e_r5}
EPOCHS=${2:-90}
REPO=$(cd "$(dirname "$0")/.." && pwd)
CFG=$ROOT/synth.yaml
EVALCFG=$ROOT/synth_eval.yaml
CKP=tc29r5

mkdir -p "$ROOT/run"
cd "$ROOT/run"

# eval-time config: identical to the train config plus the opt-in
# approx block scan (config knob scan_topk; retrieval/search.py)
python - "$CFG" "$EVALCFG" <<'EOF'
import sys, yaml
cfg = yaml.safe_load(open(sys.argv[1]))
cfg["scan_topk"] = "approx"
cfg["scan_recall"] = 0.99
yaml.safe_dump(cfg, open(sys.argv[2], "w"), sort_keys=False)
EOF
python - "$ROOT/test_config.yaml" "$CKP" <<'EOF'
import sys, yaml
yaml.safe_dump({sys.argv[2]: ["best"]}, open(sys.argv[1], "w"))
EOF

echo "==== train ($EPOCHS epochs, ckp $CKP, cwd $PWD) ===="
python "$REPO/train.py" --config "$CFG" --ckp "$CKP" --epochs "$EPOCHS" \
    --validate_every 30 --cache_decoded

echo "==== eval sweep (reference icassp.sh:36-70 shape; ivfpq + approx scan) ===="
RECOMPUTE=--recompute
for SNR in 20 15 10 5 0; do
  echo "---- test_fp SNR=${SNR}dB (with IR) ----"
  python "$REPO/test_fp.py" --config "$EVALCFG" \
      --test_config "$ROOT/test_config.yaml" \
      --test_dir "$ROOT/eval_tracks" --model "$CKP" --text "r5_snr$SNR" \
      --test_snr "$SNR" --n_query_db 400 --test_ids 400 $RECOMPUTE
  RECOMPUTE=""
done

echo "---- test_fp SNR=5dB sanir (no IR) ----"
python "$REPO/test_fp.py" --config "$EVALCFG" \
    --test_config "$ROOT/test_config.yaml" \
    --test_dir "$ROOT/eval_tracks" --model "$CKP" --text "r5_sanir_snr5" \
    --test_snr 5 --n_query_db 400 --test_ids 400

echo "==== done ===="
