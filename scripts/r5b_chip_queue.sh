#!/bin/bash
# r5 second chip queue (after driver restart killed arm s21 mid-launch):
#   1. The 200k-game tabular run of record on the packed explicit-DMA
#      table (scripts/r5_tabular_rerun.sh) — ~6 min, validates the r5
#      table kernels end-to-end at reference volume.
#   2. Warm-start arm s21, capped at 3,500 episodes: the hypothesis under
#      test is whether a warm-started run wins in the reference's ~1,858
#      class (VERDICT r4 #1); 3,500 covers that window with ~2x margin,
#      and s20's full 7,000-episode arm already bounds the long tail.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

bash scripts/r5_tabular_rerun.sh
echo "[r5b] tabular rerun done"

common=(--envs 128 --batch 64 --memory-size 50000
        --updates-per-episode 100 --steps-per-chunk 16
        --watchdog 1200 --checkpoint-every 1000)
d=runs/dqn_warmstart/s21
mkdir -p "$d"
SUPERVISE_HANG_COOLDOWN=${SUPERVISE_HANG_COOLDOWN:-450} \
scripts/train_supervised.sh "${common[@]}" \
  --checkpoint-dir "$d/ckpt" --log "$d/metrics.jsonl" \
  --episodes 3500 --rollback --stop-at-tile 2048 \
  --seed 21 --warm-start runs/dqn_warmstart/warmup/ckpt --resume \
  > "$d/stdout.log" 2>&1
rc=$?
echo "$rc" > "$d/rc.txt"
if [ "$rc" -eq 0 ]; then
  python - "$d" <<'PYEOF'
import json, sys
sys.path.insert(0, ".")
from tpu2048.metrics.analyze import analyze
d = sys.argv[1]
json.dump(analyze(f"{d}/metrics.jsonl"), open(f"{d}/analysis.json", "w"), indent=2)
PYEOF
fi
echo "[r5b] s21 rc=$rc"
echo "[r5b] all done"
