#!/bin/bash
# Synthetic-corpus rehearsal of the reference's icassp.sh sweep
# (/root/reference/icassp.sh:36-70) through the UNMODIFIED CLI entry
# points, on the real TPU. Run scripts/setup_synth_icassp.py first.
#
#   bash scripts/e2e_cli_icassp.sh [ROOT] [EPOCHS]
#
# Flow: train.py (SimCLR, --ckp tc_29 so test_fp applies the benchmark
# offset 0.05 / overlap 0.9 preset) -> test_fp.py per SNR in
# {20, 15, 10, 5, 0} with IR (+ one 'sanir' row), ivfpq index, frozen
# indices split, hit-rate tables to stdout + TensorBoard.

set -e
ROOT=${1:-/tmp/grafp_cli_e2e}
EPOCHS=${2:-90}
CFG=$ROOT/synth.yaml

echo "==== train (${EPOCHS} epochs) ===="
python train.py --config "$CFG" --ckp tc_29 --epochs "$EPOCHS" \
    --validate_every 30 --cache_decoded

echo "==== eval sweep (reference icassp.sh:36-70 shape) ===="
RECOMPUTE=--recompute
for SNR in 20 15 10 5 0; do
  echo "---- test_fp SNR=${SNR}dB (with IR) ----"
  python test_fp.py --config "$CFG" --test_config "$ROOT/test_config.yaml" \
      --test_dir "$ROOT/eval_tracks" --model tc_29 --text "synth_snr$SNR" \
      --test_snr "$SNR" --n_query_db 200 --test_ids 400 $RECOMPUTE
  RECOMPUTE=""
done

echo "---- test_fp SNR=5dB sanir (no IR) ----"
python test_fp.py --config "$CFG" --test_config "$ROOT/test_config.yaml" \
    --test_dir "$ROOT/eval_tracks" --model tc_29 --text "synth_sanir_snr5" \
    --test_snr 5 --n_query_db 200 --test_ids 400

echo "==== done ===="
