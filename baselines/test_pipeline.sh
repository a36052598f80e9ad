#!/bin/bash
# Baseline single-SNR eval (reference baselines/test_pipeline.sh role).
python baselines/test_fp.py --query_lens=1,2,3,5 --n_query_db=500 \
    --test_snr=${1:-10} --text=baseline_pipeline \
    --test_ids=data/medeval_ids.npy --model=tc10 --small_test
