#!/bin/bash
# r5 tabular 200k-game run of record on the PACKED explicit-DMA Q-table
# (agents/tabular_fast.py + ops/table_kernel.py — table_backend auto →
# pallas on TPU). Same protocol as runs/tabular_200k (reference volume,
# 2048.pdf §5.1); at 2.7M env-steps/s this replays in ~4 minutes of chip
# time, making the packed path's end-to-end validation at full scale
# essentially free. Saves the table in the canonical .npz layout (the
# trainer unpacks on save), then greedy-evals it through the legacy
# lookup path — exercising the pack → train → unpack → eval interop.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
d=runs/tabular_200k_r5
mkdir -p "$d"
timeout 3000 python -m tpu2048 train tabular \
  --episodes 200000 --batch 1024 --capacity-log2 25 --reward shaped \
  --steps-per-chunk 256 --seed 0 --watchdog 900 \
  --save "$d/qtable.npz" --log "$d/metrics.jsonl" \
  > "$d/stdout.log" 2>&1
rc=$?
echo "$rc" > "$d/rc.txt"
if [ "$rc" -eq 0 ]; then
  # Same eval protocol as the r3/r4 runs of record (default env) so the
  # left-bias numbers stay directly comparable across rounds.
  timeout 1200 python -m tpu2048 eval --policy tabular \
    --table "$d/qtable.npz" \
    --games 2048 --eval-batch 2048 > "$d/eval_greedy.json" 2>"$d/eval.log"
  python -m tpu2048 plot --log "$d/metrics.jsonl" --out "$d/training.png" \
    >> "$d/stdout.log" 2>&1 || true
  # The ~200 MB qtable.npz stays uncommitted (reproduces in ~4 min);
  # keep the metrics/eval artifacts.
fi
echo "tabular r5 rerun rc=$rc"
