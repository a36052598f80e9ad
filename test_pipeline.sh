#!/bin/bash
# Small single-SNR eval against stored test ids (reference
# test_pipeline.sh contract).
python test_fp.py --query_lens=1,2,3,5 --n_query_db=500 \
    --test_snr=${1:-10} --text=pipeline_test \
    --test_ids=data/medeval_ids.npy --model=tc_29 --small_test
