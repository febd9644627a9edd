"""Summarize the multi-seed DQN variance band for PARITY.md.

Collects `analyze` output for the run-of-record log (seed 0,
runs/dqn_r3) and each runs/seeds/s*/metrics.jsonl, and prints a
markdown table of milestone timings (episodes / env-steps / train-steps
axes) plus late-run quality, the seed-variance band the reference's
single-seed "2048 at episode 1858" claim lacks.

Usage:  PYTHONPATH=/root/repo python runs/seeds/summarize.py
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from tpu2048.metrics.analyze import analyze  # noqa: E402


def fmt(v):
    if v is None:
        return "—"
    if isinstance(v, float):
        return f"{v:,.0f}"
    return f"{v:,}"


def main():
    logs = []
    if os.path.exists("runs/dqn_rollback/metrics.jsonl"):
        logs.append(
            ("0 (+rollback, run of record)",
             "runs/dqn_rollback/metrics.jsonl")
        )
    if os.path.exists("runs/dqn_r3/metrics.jsonl"):
        logs.append(("0 (r3, rollback off)", "runs/dqn_r3/metrics.jsonl"))
    for d in sorted(glob.glob("runs/seeds/s*/")):
        path = os.path.join(d, "metrics.jsonl")
        if os.path.exists(path):
            seed = d.rstrip("/").split("s")[-1]
            rc_path = os.path.join(d, "rc.txt")
            if not os.path.exists(rc_path):
                # No completion marker: the run is in flight or was killed
                # before run.sh could record an rc — label it so a
                # truncated entry can't pose as finished.
                seed = f"{seed} (in progress / truncated)"
            else:
                rc = open(rc_path).read().strip()
                if rc != "0":
                    # Watchdog- or crash-truncated run: keep it out of the
                    # band (its milestone timings would be right-censored).
                    print(f"WARNING: skipping seed {seed}: rc={rc} "
                          f"(truncated run)", file=sys.stderr)
                    continue
            logs.append((seed, path))

    rows = []
    for seed, path in logs:
        a = analyze(path)
        rows.append((seed, a))

    cols = [
        ("episodes", "episodes"),
        ("first 256 (ep)", "first_256_by_episode"),
        ("first 512 (ep)", "first_512_by_episode"),
        ("first 1024 (ep)", "first_1024_by_episode"),
        ("first 2048 (ep)", "first_2048_by_episode"),
        ("first 1024 (env steps)", "first_1024_by_env_steps"),
        ("first 1024 (train steps)", "first_1024_by_train_steps"),
        ("best tile", "best_tile"),
        ("wins", "games_won_2048"),
        ("late mean score", "late_mean_score"),
        ("rollbacks", "rollbacks"),
    ]
    print("| seed | " + " | ".join(c for c, _ in cols) + " |")
    print("|" + "---|" * (len(cols) + 1))
    for seed, a in rows:
        print(
            f"| {seed} | "
            + " | ".join(fmt(a.get(k)) for _, k in cols)
            + " |"
        )
    print()
    print(json.dumps({seed: a for seed, a in rows}, indent=2))


if __name__ == "__main__":
    main()
