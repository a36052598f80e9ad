#!/bin/bash
# Baseline ablation sweep (reference baselines/ablation.sh role).
for model in tc9 tc10 tc11 tc12; do
    echo "########## Baseline ablation: $model ##########"
    python baselines/test_fp.py --query_lens=1,2,3,5 --n_query_db=500 \
        --test_snr=${1:-10} --text=baseline_ablation_$model \
        --test_ids=data/medeval_ids.npy --model=$model
done
