"""Training drivers (layer L5 of SURVEY.md §1)."""

from tpu2048.training.tabular import (
    TabularTrainConfig,
    TabularTrainState,
    init_train_state,
    train,
    train_chunk,
)

__all__ = [
    "TabularTrainConfig",
    "TabularTrainState",
    "init_train_state",
    "train",
    "train_chunk",
]
