#!/bin/bash
# Offset/overlap ablation sweep over the tc_2x preset checkpoints
# (reference ablation.sh role).
for model in tc_27 tc_29 tc_30 tc_31; do
    echo "########## Ablation: $model ##########"
    python test_fp.py --query_lens=1,2,3,5 --n_query_db=500 \
        --test_snr=${1:-10} --text=ablation_$model \
        --test_ids=data/medeval_ids.npy --model=$model
done
