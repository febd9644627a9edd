"""Batched 2048 environments (layer L1 of SURVEY.md §1)."""

from tpu2048.env.env import (
    SHAPED,
    SIMPLE,
    EnvConfig,
    EnvState,
    Game2048Env,
    TimeStep,
    reset,
    step,
    step_with_spawn,
)
from tpu2048.env.rewards import (
    normalize_reward,
    shaped_reward,
    simple_reward,
    terminal_bonus,
    top2_tile_values,
)

__all__ = [
    "SHAPED",
    "SIMPLE",
    "EnvConfig",
    "EnvState",
    "Game2048Env",
    "TimeStep",
    "normalize_reward",
    "reset",
    "shaped_reward",
    "simple_reward",
    "step",
    "step_with_spawn",
    "terminal_bonus",
    "top2_tile_values",
]
