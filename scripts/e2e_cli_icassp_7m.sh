#!/bin/bash
# Round-5 stretch (VERDICT r4 next #3, stretch clause): ONE SNR row at
# fma_medium protocol row count — ~7M segment rows — through the
# UNMODIFIED test_fp.py on the real TPU. 35,000 eval tracks x 20 s at
# overlap 0.9 = 34,600 dummy tracks x 199 segs = 6.89M dummy rows +
# 79,600 query rows, vs the reference protocol's 24.5k dummy + 500
# query ~7M rows (/root/reference/test_fp.py:49,169-172). Published
# index (ivfpq) + the promoted approx block scan, reusing the round-5
# rehearsal's trained checkpoint (no retrain; the model is the same —
# this row exercises BUILD + INDEX + SEARCH at protocol scale).
#
#   python scripts/setup_synth_icassp.py --root /tmp/grafp_cli_e2e_7m \
#       --train_tracks 4 --eval_tracks 35000 --dur 20
#   bash scripts/e2e_cli_icassp_7m.sh [ROOT] [R5ROOT] [SNR]
#
# Isolated CWD + the rehearsal's ckp name copied in (clobber lesson:
# fp_dir and checkpoint/ are keyed by name relative to CWD).

set -e
ROOT=${1:-/tmp/grafp_cli_e2e_7m}
R5ROOT=${2:-/tmp/grafp_cli_e2e_r5}
SNR=${3:-10}
REPO=$(cd "$(dirname "$0")/.." && pwd)
CKP=tc29r5
EVALCFG=$ROOT/synth_eval.yaml

mkdir -p "$ROOT/run/checkpoint"
rm -rf "$ROOT/run/checkpoint/model_${CKP}_best"
cp -r "$R5ROOT/run/checkpoint/model_${CKP}_best" "$ROOT/run/checkpoint/"
cd "$ROOT/run"

python - "$ROOT/synth.yaml" "$EVALCFG" <<'EOF'
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

echo "==== test_fp SNR=${SNR}dB (with IR) @ ~7M rows ===="
time python "$REPO/test_fp.py" --config "$EVALCFG" \
    --test_config "$ROOT/test_config.yaml" \
    --test_dir "$ROOT/eval_tracks" --model "$CKP" --text "7m_snr$SNR" \
    --test_snr "$SNR" --n_query_db 400 --test_ids 400 --recompute
echo "==== done ===="
