"""Metrics, logging, and plotting.

Re-design of the reference's observability (SURVEY.md §2 row 15, §5):
CSV appenders (Agent/main.py:59-62; mainDQL_CNN_step2.py:22-25), a
per-episode console status line (mainDQL:333), and a 3-panel
Max-Tile/Score/Loss PNG regenerated during training (mainDQL:27-53).

Here training emits structured JSONL rows (host-0 only under multi-host);
plots are generated offline from the logs — no matplotlib in the training
path. A CSV mirror is available for reference-style tooling.
"""

from __future__ import annotations

import csv
import json
import os
from typing import Iterable, List, Optional

import jax


def _is_primary() -> bool:
    try:
        return jax.process_index() == 0
    except RuntimeError:
        return True


class JSONLLogger:
    """Append metric dicts as JSON lines; optional stdout echo."""

    def __init__(self, path: Optional[str], echo: bool = True):
        self.path = path
        self.echo = echo
        self.enabled = _is_primary()
        if self.enabled and path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            # Append mode: a resumed run continues the same metrics file
            # (the reference resumes its plot arrays the same way,
            # Dqn8:475-487).
            self._fh = open(path, "a", buffering=1)
        else:
            self._fh = None

    def log(self, row: dict) -> None:
        if not self.enabled:
            return
        if self._fh:
            self._fh.write(json.dumps(row) + "\n")
        if self.echo:
            parts = []
            for k, v in row.items():
                if isinstance(v, float):
                    parts.append(f"{k}={v:.4g}")
                elif isinstance(v, list):
                    continue
                else:
                    parts.append(f"{k}={v}")
            print(" ".join(parts), flush=True)

    def close(self) -> None:
        if self._fh:
            self._fh.close()


class CSVLogger:
    """Reference-style CSV appender (Agent/main.py:59-62; mainDQL:22-25)."""

    def __init__(self, path: str, header: List[str]):
        self.enabled = _is_primary()
        self.path = path
        if self.enabled:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            new = not os.path.exists(path)
            self._fh = open(path, "a", newline="", buffering=1)
            self._writer = csv.writer(self._fh)
            if new:
                self._writer.writerow(header)

    def log(self, row: Iterable) -> None:
        if self.enabled:
            self._writer.writerow(list(row))

    def close(self) -> None:
        if self.enabled:
            self._fh.close()


def read_jsonl(path: str) -> List[dict]:
    rows = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def plot_training(
    rows: List[dict],
    out_path: str,
    keys=("best_tile", "mean_score", "loss"),
    titles=("Max Tile per Game", "Score per Game", "Loss per Game"),
) -> None:
    """3-panel training plot (the reference's ``plot_results``,
    mainDQL:27-53), generated offline from JSONL rows."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x = [r.get("episodes", i) for i, r in enumerate(rows)]
    fig, axes = plt.subplots(len(keys), 1, figsize=(12, 12))
    for ax, key, title in zip(axes, keys, titles):
        ax.plot(x, [r.get(key, float("nan")) for r in rows])
        ax.set_title(title)
        ax.set_xlabel("Episodes")
        ax.set_ylabel(key)
    fig.subplots_adjust(hspace=0.5)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig.savefig(out_path)
    plt.close(fig)


def plot_from_jsonl(jsonl_path: str, out_path: str) -> None:
    plot_training(read_jsonl(jsonl_path), out_path)
