#!/bin/bash
# r5 chip queue — runs the round-5 experiments SEQUENTIALLY (one TPU
# process at a time on this machine), in VERDICT r4 priority order:
#
#   1. (separately launched first: scripts/r4_per_ablation.sh — the
#      deferred alpha=0.6 / 3,500-episode PER ablation, VERDICT #2)
#   2. Warm-start lineage experiment (VERDICT #1): a fresh ~1,900-episode
#      warmup under the full protocol, then TWO warm-started arms
#      (--warm-start, different seeds) run to first 2048 or 7k episodes.
#      This turns PARITY.md's resumed-pretrained-lineage attribution of
#      the reference's ep-1858 anchor (mainDQL:124-126,133-139;
#      pretrain1/2.png) into a measurement: does a warm-started run's
#      episodes-from-resume-to-win land in the ~1,858 class?
#   3. A second FULL-LENGTH rollback arm (VERDICT #4): seed 6 under the
#      complete paper protocol to first win or 10k episodes, so the
#      "rollback is inside seed variance" conclusion has >=2 full-length
#      rollback entries (s5's 4,038 is currently the only one).
#
# Waits for the PER ablation to finish first (its rc.txt append is the
# completion marker) so two TPU processes never overlap.
set -u
cd "$(dirname "$0")/.."

PER_MARKER=runs/per_ablation_3500/rc.txt
echo "[r5-queue] waiting for PER ablation marker $PER_MARKER"
while [ ! -f "$PER_MARKER" ]; do sleep 60; done
echo "[r5-queue] PER done (rc=$(cat "$PER_MARKER")); starting warmup"

common=(--envs 128 --batch 64 --memory-size 50000
        --updates-per-episode 100 --steps-per-chunk 16
        --watchdog 1200 --checkpoint-every 1000)

run_one() { # dir, extra args...
  local d=$1; shift
  mkdir -p "$d"
  SUPERVISE_HANG_COOLDOWN=${SUPERVISE_HANG_COOLDOWN:-450} \
  scripts/train_supervised.sh "${common[@]}" \
    --checkpoint-dir "$d/ckpt" --log "$d/metrics.jsonl" "$@" \
    > "$d/stdout.log" 2>&1
  local rc=$?
  echo "$rc" > "$d/rc.txt"
  if [ "$rc" -eq 0 ]; then
    python - "$d" <<'EOF'
import json, sys
sys.path.insert(0, ".")
from tpu2048.metrics.analyze import analyze
d = sys.argv[1]
json.dump(analyze(f"{d}/metrics.jsonl"), open(f"{d}/analysis.json", "w"),
          indent=2)
EOF
  fi
  echo "[r5-queue] $d rc=$rc"
  return "$rc"
}

# --- 2a. warmup: the "pretraining parts" of the lineage ----------------
w=runs/dqn_warmstart/warmup
if [ ! -f "$w/rc.txt" ] || [ "$(cat "$w/rc.txt")" != 0 ]; then
  run_one "$w" --episodes 1900 --rollback --seed 10
fi
if [ "$(cat "$w/rc.txt")" != 0 ]; then
  echo "[r5-queue] warmup failed; skipping warm-start arms" >&2
else
  # --- 2b. two warm-started arms, full protocol, to first win ----------
  for s in 20 21; do
    d=runs/dqn_warmstart/s$s
    [ -f "$d/rc.txt" ] && [ "$(cat "$d/rc.txt")" = 0 ] && continue
    run_one "$d" --episodes 7000 --rollback --stop-at-tile 2048 \
      --seed "$s" --warm-start "$w/ckpt" --resume
  done
fi

# --- 3. second full-length rollback arm (seed 6) -----------------------
d=runs/seeds/s6
if [ ! -f "$d/rc.txt" ] || [ "$(cat "$d/rc.txt")" != 0 ]; then
  run_one "$d" --episodes 10000 --rollback --stop-at-tile 2048 --seed 6
fi

echo "[r5-queue] all done"
