#!/bin/bash
# Supervised DQN training: relaunch with --resume whenever the watchdog
# detects a hang (a wedged device call never raises — the in-process
# watchdog converts it to exit 70) or the process crashes. Requires
# --checkpoint-dir so there is something to resume from.
#
# Usage:
#   scripts/train_supervised.sh --episodes 10000 --envs 128 \
#     --checkpoint-dir runs/x/ckpt --log runs/x/metrics.jsonl [--seed 0 ...]
#
# Any `train dqn` flag passes through. The watchdog window defaults to
# 900 s (> worst-case compile + full-state checkpoint I/O over a tunneled
# TPU); override by passing your own --watchdog.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

WATCHDOG=900
MAX_RESTARTS=${SUPERVISE_MAX_RESTARTS:-20}
# Cool-down after a watchdog exit: the PJRT relay's claim timeout must
# expire before reattaching. Overridable for tests / local CPU runs.
HANG_COOLDOWN=${SUPERVISE_HANG_COOLDOWN:-600}
CRASH_COOLDOWN=${SUPERVISE_CRASH_COOLDOWN:-30}
args=("$@")
# Both spellings: "--watchdog N" and "--watchdog=N".
case " $* " in *" --watchdog "* | *" --watchdog="*) WATCHDOG="" ;; esac

attempt=0
resume=()
while :; do
  attempt=$((attempt + 1))
  python -m tpu2048 train dqn "${args[@]}" \
    ${WATCHDOG:+--watchdog "$WATCHDOG"} "${resume[@]}"
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "[supervise] training completed (attempt $attempt)"
    exit 0
  fi
  if [ "$rc" -eq 2 ]; then
    # argparse usage error — permanently broken invocation, never retry.
    echo "[supervise] usage error (rc=2); not retrying" >&2
    exit 2
  fi
  if [ "$attempt" -ge "$MAX_RESTARTS" ]; then
    echo "[supervise] giving up after $attempt attempts (last rc=$rc)" >&2
    exit "$rc"
  fi
  if [ "$rc" -eq 70 ]; then
    echo "[supervise] watchdog exit (hang); cooling down ${HANG_COOLDOWN} s, then resuming" >&2
    sleep "$HANG_COOLDOWN"
  else
    echo "[supervise] exit rc=$rc; resuming in ${CRASH_COOLDOWN} s" >&2
    sleep "$CRASH_COOLDOWN"
  fi
  resume=(--resume)
done
