#!/bin/bash
# Quick bench sweep for the gap between training runs (real chip,
# ~10 min): tabular (bucketed table + shaped kernel), learner (alpha=0
# skip), fused-conv A/B, headline. One JSON line each into the log.
set -u
cd "$(dirname "$0")/.."
log=${1:-docs/bench_r4_gap.jsonl}
: > "$log"
run() { echo "== $*" | tee -a "$log"; timeout 900 "$@" 2>&1 | grep -E '^\{' | tee -a "$log"; }
run python bench.py --tabular --batch 1024
run python bench.py --tabular --batch 4096
run python bench.py --learner
run python bench.py
echo "done -> $log"
