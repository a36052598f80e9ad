#!/bin/bash
# int8_static retrieval-level sign-off (VERDICT r4 next #4).
#
# Round 4 promoted serve_quant=int8_static on a 1.050x speed win with
# fingerprint cos min 0.983 vs bf16 — but no retrieval hit-rate
# measurement existed. This runs the synthetic protocol sweep with the
# SAME trained checkpoint under bf16 and int8_static at SNR {10,5,0}
# and reports top-1/top-3 deltas, replacing the "needs sign-off per
# deployment" caveat with a number.
#
# Prereqs: the round-5 rehearsal workspace (trained tc29r5 checkpoint in
# $R5ROOT/run/checkpoint) and a 1,200-track eval corpus (round-2 scale,
# which the VERDICT deems sufficient):
#   python scripts/setup_synth_icassp.py --root /tmp/grafp_int8_signoff \
#       --train_tracks 4 --eval_tracks 1200 --dur 20
#   bash scripts/e2e_int8_signoff.sh [ROOT] [R5ROOT]
#
# Each quant mode runs in its OWN CWD (fp dirs are keyed by checkpoint
# name relative to CWD — the round-3 clobber lesson); dummy DB is
# recomputed once per mode (int8 fingerprints differ from bf16's), then
# the SNR rows reuse it.

set -e
ROOT=${1:-/tmp/grafp_int8_signoff}
R5ROOT=${2:-/tmp/grafp_cli_e2e_r5}
REPO=$(cd "$(dirname "$0")/.." && pwd)
CKP=tc29r5

python - "$ROOT/test_config.yaml" "$CKP" <<'EOF'
import sys, yaml
yaml.safe_dump({sys.argv[2]: ["best"]}, open(sys.argv[1], "w"))
EOF

for QUANT in bf16 int8_static; do
  CFG=$ROOT/synth_$QUANT.yaml
  python - "$ROOT/synth.yaml" "$CFG" "$QUANT" <<'EOF'
import sys, yaml
cfg = yaml.safe_load(open(sys.argv[1]))
cfg["scan_topk"] = "approx"
cfg["scan_recall"] = 0.99
if sys.argv[3] != "bf16":
    cfg["serve_quant"] = sys.argv[3]
yaml.safe_dump(cfg, open(sys.argv[2], "w"), sort_keys=False)
EOF
  RUN=$ROOT/run_$QUANT
  mkdir -p "$RUN/checkpoint"
  # Orbax checkpoints are directories
  rm -rf "$RUN/checkpoint/model_${CKP}_best"
  cp -r "$R5ROOT/run/checkpoint/model_${CKP}_best" "$RUN/checkpoint/"
  cd "$RUN"
  RECOMPUTE=--recompute
  for SNR in 10 5 0; do
    echo "==== $QUANT SNR=${SNR}dB ===="
    python "$REPO/test_fp.py" --config "$CFG" \
        --test_config "$ROOT/test_config.yaml" \
        --test_dir "$ROOT/eval_tracks" --model "$CKP" \
        --text "int8signoff_${QUANT}_snr$SNR" \
        --test_snr "$SNR" --n_query_db 200 --test_ids 400 $RECOMPUTE
    RECOMPUTE=""
  done
done
echo "==== done: compare hit-rate tables between run_bf16 and run_int8_static ===="
