#!/bin/bash
# End-to-end train.py input-throughput measurement on the REAL TPU
# (VERDICT r4 next #1, second half): train on an mp3 corpus (fma's
# format, 44.1 kHz masters) for several epochs in each input mode and
# read the sustained pairs/s off the per-epoch wall clocks that
# train.py already prints.
#
# Prereq: the mp3 corpus from scripts/profile_input_pipeline.py
# extended to 512 tracks (bsz 256 -> 2 steps/epoch):
#   python - <<'EOF'
#   import sys; sys.path[:0] = ['/root/repo', '/root/repo/scripts']
#   from profile_input_pipeline import build_corpus
#   build_corpus('/tmp/grafp_input_prof', 512, 30.0, 44100)
#   EOF
#   bash scripts/e2e_train_input_mp3.sh [ROOT]
#
# Three runs, fresh process each (isolated CWDs, unique ckp names):
#   A  no cache          every epoch re-decodes (reference behavior)
#   B  --cache_decoded   RAM dict: epoch 1 cold, 2+ warm
#   C  --cache_dir       disk cache COLD then a 2nd process WARM
#      (the decode-once-memmap-forever mode; warm includes epoch 1)

set -e
ROOT=${1:-/tmp/grafp_input_prof}
REPO=$(cd "$(dirname "$0")/.." && pwd)
TRACKS=$ROOT/mp3_tracks
EPOCHS=${2:-4}

# noise/IR banks + config (the corpus profiler doesn't make them)
python - "$ROOT" "$TRACKS" "$REPO" <<'EOF'
import os, sys, yaml
repo = sys.argv[3]
sys.path[:0] = [repo, os.path.join(repo, "tests")]
root, tracks = sys.argv[1], sys.argv[2]
from fixtures import make_wav_dir
for name, n, dur, seed, kind in (("noise", 24, 5.0, 30, "noise"),
                                 ("ir", 12, 0.5, 40, "ir")):
    d = os.path.join(root, name)
    if not os.path.isdir(d) or len(os.listdir(d)) < n:
        make_wav_dir(d, n=n, dur_s=dur, sr=16000, seed=seed, kind=kind)
cfg = yaml.safe_load(open(os.path.join(repo, "config", "grafp.yaml")))
n = len([f for f in os.listdir(tracks) if f.endswith(".mp3")])
cfg.update(data_dir=os.path.join(root, "data"), train_dir=tracks,
           val_dir=tracks, noise_dir=os.path.join(root, "noise"),
           ir_dir=os.path.join(root, "ir"), train_sz=n, val_sz=n,
           bsz_train=256)
yaml.safe_dump(cfg, open(os.path.join(root, "mp3_train.yaml"), "w"),
               sort_keys=False)
print(f"[setup] config for {n} mp3 tracks, bsz 256")
EOF

CFG=$ROOT/mp3_train.yaml
run() {  # name, extra flags...
  NAME=$1; shift
  RUN=$ROOT/tr_$NAME
  mkdir -p "$RUN"
  cd "$RUN"
  echo "==== train.py mode $NAME ($EPOCHS epochs) ===="
  python "$REPO/train.py" --config "$CFG" --ckp "mp3e2e_$NAME" \
      --epochs "$EPOCHS" --validate_every 0 "$@" \
    | grep -E "Epoch|epoch time|Net Loss" || true
}

# Three TPU runs (each fresh process pays its own jit compile, so read
# rates off epoch 2+). Disk-cache COLD build cost is the host-only
# profiler's number; here the disk run reuses the profiler's cache
# (decoded_cache) and back-fills any missing tracks on first touch.
run nocache
run ramcache --cache_decoded
run diskwarm --cache_dir "$ROOT/decoded_cache"
echo "==== done: pairs/s = (steps*256)/epoch_time per mode ===="
