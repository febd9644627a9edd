"""Summarize the resumed-lineage (warm-start) experiment for PARITY.md.

The reference's episode-1858 win comes from a RESUMED multi-part lineage:
its committed driver starts at episode 1900 with a pretrained network,
the replay memory, and a decayed epsilon
(/root/reference/Deep_QLearning/main_dir/mainDQL_CNN_step2.py:124-126,
133-139; shipped pretrain1/2.png), and the winning artifact's episode tag
(1,858 < the 1,900 resume point) shows the counter restarted. This
experiment reproduces that protocol: runs/dqn_warmstart/warmup/ trains
~1,900 episodes from scratch under the full protocol, and each
runs/dqn_warmstart/s*/ arm `--warm-start`s from the warmup checkpoint
under a fresh seed, so its `first_2048_by_episode` IS
episodes-from-resume-to-win — the number directly comparable to the
reference's 1,858 anchor.

Usage:  PYTHONPATH=/root/repo python runs/dqn_warmstart/summarize.py
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
    # Two warmup lineages can exist: the original (source of arm s20) and
    # the r5c rebuild (source of arm s21 — the original's checkpoints
    # were wiped by a driver restart; same seed 10, same protocol).
    for name, label in [
        ("warmup", "warmup (cold, 1,900 ep; lineage of s20)"),
        ("warmup_r5c", "warmup_r5c (cold rebuild; lineage of s21)"),
    ]:
        path = f"runs/dqn_warmstart/{name}/metrics.jsonl"
        if os.path.exists(path):
            logs.append((label, path))
    for d in sorted(glob.glob("runs/dqn_warmstart/s*/")):
        path = os.path.join(d, "metrics.jsonl")
        if not os.path.exists(path):
            continue
        seed = d.rstrip("/").split("s")[-1]
        label = f"warm-start seed {seed}"
        rc_path = os.path.join(d, "rc.txt")
        if not os.path.exists(rc_path):
            label += " (in progress / truncated)"
        else:
            rc = open(rc_path).read().strip()
            if rc != "0":
                # Include truncated arms (e.g. rc=124, killed at a chip
                # deadline): their milestone timings up to the cut are
                # real measurements, just label them honestly.
                label += f" (truncated, rc={rc})"
        logs.append((label, path))

    cols = [
        ("episodes", "episodes"),
        ("first 512 (ep)", "first_512_by_episode"),
        ("first 1024 (ep)", "first_1024_by_episode"),
        ("first 2048 (ep from resume)", "first_2048_by_episode"),
        ("first 2048 (env steps)", "first_2048_by_env_steps"),
        ("best tile", "best_tile"),
        ("late mean score", "late_mean_score"),
        ("rollbacks", "rollbacks"),
    ]
    rows = [(label, analyze(path)) for label, path in logs]
    print("| arm | " + " | ".join(c for c, _ in cols) + " |")
    print("|" + "---|" * (len(cols) + 1))
    for label, a in rows:
        print(
            f"| {label} | "
            + " | ".join(fmt(a.get(k)) for _, k in cols)
            + " |"
        )
    print()
    print("reference anchor: first 2048 at episode 1,858 FROM ITS RESUME "
          "(mainDQL:126; GameDemo.py:208)")
    print()
    print(json.dumps({label: a for label, a in rows}, indent=2))


if __name__ == "__main__":
    main()
