#!/bin/bash
# r4 tabular 200k-game run of record, now on the shaped FAST engine
# (fused Pallas kernel in shaped mode + 16-way bucketed Q-table).
# Same protocol as runs/tabular_200k (reference volume, 2048.pdf §5.1).
set -u
cd "$(dirname "$0")/.."
d=runs/tabular_200k_r4
mkdir -p "$d"
python -m tpu2048 train tabular \
  --episodes 200000 --batch 1024 --capacity-log2 25 --reward shaped \
  --steps-per-chunk 256 --seed 0 --watchdog 900 \
  --save "$d/qtable.npz" --log "$d/metrics.jsonl" \
  > "$d/stdout.log" 2>&1
rc=$?
echo "$rc" > "$d/rc.txt"
if [ "$rc" -eq 0 ]; then
  python -m tpu2048 eval --policy tabular --table "$d/qtable.npz" \
    --games 2048 --eval-batch 2048 > "$d/eval_greedy.json" 2>"$d/eval.log"
  python -m tpu2048 plot --log "$d/metrics.jsonl" --out "$d/training.png" \
    >> "$d/stdout.log" 2>&1 || true
fi
echo "tabular rerun rc=$rc"
