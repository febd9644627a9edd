"""Agents (layer L3 of SURVEY.md §1): tabular Q-learning and DQN."""

from tpu2048.agents.tabular import (
    QTable,
    TabularConfig,
    choose_actions,
    epsilon_for_epoch,
    pack_board,
    q_learning_targets,
    qtable_init,
    qtable_lookup,
    qtable_update,
)

__all__ = [
    "QTable",
    "TabularConfig",
    "choose_actions",
    "epsilon_for_epoch",
    "pack_board",
    "q_learning_targets",
    "qtable_init",
    "qtable_lookup",
    "qtable_update",
]
