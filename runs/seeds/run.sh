#!/bin/bash
# Multi-seed variance band for the DQN run-of-record protocol
# (seed 0 = runs/dqn_r3: exact reference cadence, rollback OFF — the
# reference ships the rollback block commented out, mainDQL:278-314).
# Short runs: enough episodes to time the 256/512/1024 milestones and
# the late mean score under seed variance.
#
# s1/s2 were run (round 2) WITH --rollback at the same cadence; they
# double as the rollback-policy ablation. Later seeds run the
# run-of-record protocol exactly.
#
# Each seed runs under the watchdog+resume supervisor: the TPU tunnel on
# this box wedges roughly hourly (observed twice on 2026-08-20), and a
# checkpointed resume preserves the seed's full 3500 episodes instead of
# truncating the band entry.
# Sequential — ONE TPU process at a time on this machine.
# r4 protocol (EPISODES/EXTRA env overrides): full rollback protocol —
# the paper's actual configuration (2048.pdf §6) — run to 7k episodes or
# first win, whichever comes first (--stop-at-tile 2048). Earlier rounds'
# entries used EPISODES=3500 and (s3/s4) no rollback.
set -u
cd /root/repo
EPISODES=${EPISODES:-7000}
for s in "$@"; do
  d=runs/seeds/s$s
  mkdir -p "$d"
  SUPERVISE_HANG_COOLDOWN=${SUPERVISE_HANG_COOLDOWN:-450} \
  scripts/train_supervised.sh \
    --episodes "$EPISODES" --envs 128 --batch 64 --memory-size 50000 \
    --updates-per-episode 100 --steps-per-chunk 16 --seed "$s" \
    --rollback --stop-at-tile 2048 \
    --watchdog 1200 --checkpoint-dir "$d/ckpt" --checkpoint-every 1000 \
    --log "$d/metrics.jsonl" > "$d/stdout.log" 2>&1
  rc=$?
  # Durable completion marker: a truncated run (supervisor gave up) must
  # not enter the PARITY seed band as if it finished (summarize.py skips
  # rc != 0).
  echo "$rc" > "$d/rc.txt"
  echo "seed $s done rc=$rc"
done
