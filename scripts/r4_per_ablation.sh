#!/bin/bash
# r4 PER ablation, deepened (VERDICT r3 item 6): alpha=0.6 under the
# EXACT reference cadence to 3,500 episodes — past first-1024 territory,
# directly comparable to the seed band (the r3 ablation stopped at 1,000
# episodes / tile 512, inside the alpha=0 early band).
# Reference PER machinery: Dqn8TestNOPERCNN.py:67-104 (run of record
# shipped with alpha=0, "NOPER", Dqn8:249).
set -u
cd "$(dirname "$0")/.."
d=runs/per_ablation_3500
mkdir -p "$d"
SUPERVISE_HANG_COOLDOWN=${SUPERVISE_HANG_COOLDOWN:-450} \
scripts/train_supervised.sh \
  --episodes 3500 --envs 128 --batch 64 --memory-size 50000 \
  --updates-per-episode 100 --steps-per-chunk 16 --seed 0 \
  --per-alpha 0.6 \
  --watchdog 1200 --checkpoint-dir "$d/ckpt" --checkpoint-every 1000 \
  --log "$d/metrics.jsonl" > "$d/stdout.log" 2>&1
rc=$?
echo "$rc" > "$d/rc.txt"
if [ "$rc" -eq 0 ]; then
  python - <<EOF
import json, sys
sys.path.insert(0, ".")
from tpu2048.metrics.analyze import analyze
json.dump(analyze("$d/metrics.jsonl"), open("$d/analysis.json", "w"), indent=2)
EOF
fi
echo "per ablation rc=$rc"
