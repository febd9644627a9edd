"""Core batched board kernels (engine layer L0 of SURVEY.md §1)."""

from tpu2048.ops.board import (
    DOWN,
    LEFT,
    NUM_ACTIONS,
    RIGHT,
    UP,
    board_values,
    init_board,
    is_game_over,
    legal_moves_mask,
    max_tile_value,
    move,
    move_all,
    sample_spawn,
    select_move,
    spawn_at,
    spawn_random_tile,
    values_to_exponents,
)
from tpu2048.ops.rows import MAX_EXPONENT, merge_rows_left

__all__ = [
    "DOWN",
    "LEFT",
    "MAX_EXPONENT",
    "NUM_ACTIONS",
    "RIGHT",
    "UP",
    "board_values",
    "init_board",
    "is_game_over",
    "legal_moves_mask",
    "max_tile_value",
    "merge_rows_left",
    "move",
    "move_all",
    "sample_spawn",
    "select_move",
    "spawn_at",
    "spawn_random_tile",
    "values_to_exponents",
]
