"""Training drivers (layer L5 of SURVEY.md §1)."""

from tpu2048.training.dqn import (
    DQNLoopState,
    DQNTrainConfig,
    init_loop_state,
)
from tpu2048.training.dqn import train as train_dqn
from tpu2048.training.dqn import train_chunk as dqn_train_chunk
from tpu2048.training.tabular import (
    TabularTrainConfig,
    TabularTrainState,
    init_train_state,
    train,
    train_chunk,
)

__all__ = [
    "DQNLoopState",
    "DQNTrainConfig",
    "TabularTrainConfig",
    "TabularTrainState",
    "dqn_train_chunk",
    "init_loop_state",
    "init_train_state",
    "train",
    "train_chunk",
    "train_dqn",
]
