#!/bin/bash
# Multi-seed variance band for the DQN run-of-record protocol
# (seed 0 = runs/dqn_r3: exact reference cadence, rollback OFF — the
# reference ships the rollback block commented out, mainDQL:278-314).
# Short runs: enough episodes to time the 256/512/1024 milestones and
# the late mean score under seed variance.
#
# s1/s2 were run (round 2) WITH --rollback at the same cadence; they
# double as the rollback-policy ablation. New seeds here run the
# run-of-record protocol exactly.
# Sequential — ONE TPU process at a time on this machine.
set -u
cd /root/repo
for s in "$@"; do
  d=runs/seeds/s$s
  mkdir -p "$d"
  PYTHONPATH=/root/repo:${PYTHONPATH:-} python -m tpu2048 train dqn \
    --episodes 3500 --envs 128 --batch 64 --memory-size 50000 \
    --updates-per-episode 100 --steps-per-chunk 16 --seed "$s" \
    --watchdog 1200 \
    --log "$d/metrics.jsonl" > "$d/stdout.log" 2>&1
  rc=$?
  # Durable completion marker: a watchdog-truncated run (rc=70) must not
  # enter the PARITY seed band as if it finished (summarize.py warns on
  # rc != 0 / missing marker).
  echo "$rc" > "$d/rc.txt"
  echo "seed $s done rc=$rc"
done
