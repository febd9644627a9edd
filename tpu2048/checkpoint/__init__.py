"""Checkpoint / resume subsystem (SURVEY.md §2 row 12, §5)."""

from tpu2048.checkpoint.ckpt import (CheckpointManager, abstract_like,
                                     restore_params_only)

__all__ = ["CheckpointManager", "abstract_like", "restore_params_only"]
