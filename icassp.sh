#!/bin/bash
# ICASSP evaluation reproduction (reference icassp.sh contract):
#   bash icassp.sh <audio_root> <aug_root>
# Downloads checkpoints + prebuilt fingerprint DBs when a network is
# available, rebases index paths, then sweeps SNR x {with,without IR}
# on fma_medium and fma_large with the tc_29 benchmark model.

set -u

if command -v wget >/dev/null && [ ! -d checkpoint/downloaded ]; then
    echo "Downloading the trained models..."
    wget -q https://huggingface.co/chymaera96/grafp_db/resolve/main/checkpoint.zip \
        && unzip -q checkpoint.zip -d data/ \
        && mkdir -p baselines/checkpoint checkpoint \
        && mv data/checkpoint/AST/* baselines/checkpoint/ 2>/dev/null \
        && mv data/checkpoint/GraFP/* checkpoint/ 2>/dev/null \
        && rm -rf data/checkpoint checkpoint.zip \
        && touch checkpoint/downloaded
    echo "Downloading the fingerprint databases..."
    wget -q https://huggingface.co/chymaera96/grafp_db/resolve/main/databases.zip \
        && unzip -q databases.zip -d data/ \
        && mkdir -p logs/store \
        && mv data/databases/medium logs/store/ 2>/dev/null \
        && mv data/databases/large logs/store/ 2>/dev/null \
        && rm -rf data/databases databases.zip
else
    echo "(offline or already downloaded: skipping artifact fetch)"
fi

AUDIO=${1%/}
AUG=${2%/}

python setup_config.py --noise_dir=$AUG/noise --ir_dir=$AUG/ir
EVAL=$(basename $AUDIO)
python setup_icassp.py --test_dir=$AUDIO --noise_dir=$AUG/noise --ir_dir=$AUG/ir --eval_type=$EVAL

echo "########## Evaluating without IR corruption ##########"
for snr in 20 15 10 5 0; do
    echo "Test with SNR = $snr"
    python test_fp.py --query_lens=1,2,3,5 --n_query_db=500 \
        --test_snr=$snr --text=sanir_fma_medium_$snr \
        --test_ids=data/medeval_ids.npy --model=tc_29
done
for snr in 20 15 10 5 0; do
    echo "Test with SNR = $snr"
    python test_fp.py --query_lens=1,2,3,5 --n_query_db=500 --test_dir=data/fma_large.json \
        --test_snr=$snr --text=sanir_fma_large_$snr \
        --test_ids=data/largeval_ids.npy --model=tc_29
done

echo "########## Evaluating with IR corruption ##########"
for snr in 20 15 10 5 0; do
    echo "Test with SNR = $snr"
    python test_fp.py --query_lens=1,2,3,5 --n_query_db=500 \
        --test_snr=$snr --text=withir_fma_medium_$snr \
        --test_ids=data/medeval_ids.npy --model=tc_29
done
for snr in 20 15 10 5 0; do
    echo "Test with SNR = $snr"
    python test_fp.py --query_lens=1,2,3,5 --n_query_db=500 --test_dir=data/fma_large.json \
        --test_snr=$snr --text=withir_fma_large_$snr \
        --test_ids=data/largeval_ids.npy --model=tc_29
done
