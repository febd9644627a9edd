"""Replay memory (layer L2 of SURVEY.md §1)."""

from tpu2048.replay.buffer import (
    ReplayBuffer,
    ReplayConfig,
    prune_low_score_episodes,
    replay_add,
    replay_init,
    replay_peek,
    replay_sample,
    replay_update_priorities,
)

__all__ = [
    "ReplayBuffer",
    "ReplayConfig",
    "prune_low_score_episodes",
    "replay_add",
    "replay_init",
    "replay_peek",
    "replay_sample",
    "replay_update_priorities",
]
