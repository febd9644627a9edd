"""Observability subsystem (SURVEY.md §2 row 15, §5)."""

from tpu2048.metrics.logging import (
    CSVLogger,
    JSONLLogger,
    plot_from_jsonl,
    plot_training,
    read_jsonl,
)

__all__ = [
    "CSVLogger",
    "JSONLLogger",
    "plot_from_jsonl",
    "plot_training",
    "read_jsonl",
]
