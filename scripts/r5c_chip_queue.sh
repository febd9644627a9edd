#!/bin/bash
# r5 third chip queue. The driver restart wiped all Orbax checkpoint
# directories (they are never committed), which killed warm-start arm
# s21's source; this queue rebuilds the lineage and finishes the round's
# chip work under an absolute deadline so it can never collide with the
# end-of-round bench run:
#   1. 200k-game tabular rerun on the packed table (the pack/occupied
#      16 GB layout fix landed; ~8 min).
#   2. Warmup reproduction: same protocol + seed 10 as the (wiped)
#      original — the training loop is seeded, so this re-derives the
#      same lineage class (original: first-1024 at ep 385).
#   3. Warm-start arm s21 from the fresh warmup, capped at 2,800
#      episodes — 1.5x the reference's 1,858-episode hypothesis window;
#      s20's 7,000-episode arm already bounds the long tail.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

DEADLINE=${R5C_DEADLINE:-$(date -d '13:52' +%s)}
left() { echo $(( DEADLINE - $(date +%s) )); }

bash scripts/r5_tabular_rerun.sh
echo "[r5c] tabular rerun done ($(left)s to deadline)"

common=(--envs 128 --batch 64 --memory-size 50000
        --updates-per-episode 100 --steps-per-chunk 16
        --watchdog 1200 --checkpoint-every 1000)

w=runs/dqn_warmstart/warmup_r5c
mkdir -p "$w"
t=$(left); [ "$t" -lt 600 ] && { echo "[r5c] no time for warmup"; exit 0; }
SUPERVISE_HANG_COOLDOWN=450 timeout "$t" \
  scripts/train_supervised.sh "${common[@]}" \
  --checkpoint-dir "$w/ckpt" --log "$w/metrics.jsonl" \
  --episodes 1900 --rollback --seed 10 \
  > "$w/stdout.log" 2>&1
rc=$?
echo "$rc" > "$w/rc.txt"
echo "[r5c] warmup rc=$rc ($(left)s to deadline)"
[ "$rc" -ne 0 ] && { echo "[r5c] warmup failed/timed out; stopping"; exit 1; }
python - "$w" <<'PYEOF'
import json, sys
sys.path.insert(0, ".")
from tpu2048.metrics.analyze import analyze
d = sys.argv[1]
json.dump(analyze(f"{d}/metrics.jsonl"), open(f"{d}/analysis.json", "w"), indent=2)
PYEOF

d=runs/dqn_warmstart/s21
mkdir -p "$d"
t=$(left); [ "$t" -lt 600 ] && { echo "[r5c] no time for s21"; exit 0; }
SUPERVISE_HANG_COOLDOWN=450 timeout "$t" \
  scripts/train_supervised.sh "${common[@]}" \
  --checkpoint-dir "$d/ckpt" --log "$d/metrics.jsonl" \
  --episodes 2800 --rollback --stop-at-tile 2048 \
  --seed 21 --warm-start "$w/ckpt" --resume \
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
echo "[r5c] s21 rc=$rc"
echo "[r5c] all done"
