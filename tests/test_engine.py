"""Engine parity tests (SURVEY.md §4 item 1).

Golden slide/merge cases, rotation equivalence, spawn distribution,
game-over truth table, and randomized differential testing against the
*actual* reference engine (/root/reference, imported read-only at test time
with its RNG spawn stubbed out — never copied).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu2048.ops import (
    board_values,
    init_board,
    is_game_over,
    legal_moves_mask,
    max_tile_value,
    merge_rows_left,
    move,
    move_all,
    select_move,
    spawn_random_tile,
    values_to_exponents,
)

REFERENCE_ENV_DIR = "/root/reference/Deep_QLearning/environment"


def exps(values):
    """Helper: face-value list(s) -> int8 exponent array."""
    return values_to_exponents(jnp.asarray(values))


# ---------------------------------------------------------------------------
# Golden row cases (single-merge rule, reference move_left semantics)
# ---------------------------------------------------------------------------

ROW_CASES = [
    # (input values, expected values, expected score, expected moved)
    ([2, 2, 2, 2], [4, 4, 0, 0], 8, True),
    ([2, 2, 2, 0], [4, 2, 0, 0], 4, True),
    ([4, 2, 2, 0], [4, 4, 0, 0], 4, True),
    ([2, 2, 4, 4], [4, 8, 0, 0], 12, True),
    ([2, 0, 0, 2], [4, 0, 0, 0], 4, True),
    ([0, 0, 0, 2], [2, 0, 0, 0], 0, True),
    ([2, 4, 2, 4], [2, 4, 2, 4], 0, False),
    ([0, 0, 0, 0], [0, 0, 0, 0], 0, False),
    ([2, 0, 2, 2], [4, 2, 0, 0], 4, True),
    ([4, 4, 8, 8], [8, 16, 0, 0], 24, True),
    ([2, 4, 4, 2], [2, 8, 2, 0], 8, True),
    ([4, 0, 4, 4], [8, 4, 0, 0], 8, True),
    ([2048, 2048, 0, 0], [4096, 0, 0, 0], 4096, True),
    ([2, 0, 0, 0], [2, 0, 0, 0], 0, False),
    ([0, 2, 2, 0], [4, 0, 0, 0], 4, True),
]


@pytest.mark.parametrize("row,expected,score,moved", ROW_CASES)
def test_merge_row_golden(row, expected, score, moved):
    new_row, got_score, got_moved = merge_rows_left(exps(row))
    np.testing.assert_array_equal(
        np.asarray(board_values(new_row)), np.asarray(expected)
    )
    assert int(got_score) == score
    assert bool(got_moved) == moved


def test_merge_rows_batched():
    rows = jnp.stack([exps(r) for r, *_ in ROW_CASES])
    new_rows, scores, moveds = merge_rows_left(rows)
    for i, (_, expected, score, moved) in enumerate(ROW_CASES):
        np.testing.assert_array_equal(
            np.asarray(board_values(new_rows[i])), np.asarray(expected)
        )
        assert int(scores[i]) == score
        assert bool(moveds[i]) == moved


# ---------------------------------------------------------------------------
# Direction equivalence: each direction == canonicalize-to-left + merge
# ---------------------------------------------------------------------------


def test_direction_equivalence():
    board = exps(
        [
            [2, 2, 4, 0],
            [0, 2, 2, 2],
            [4, 0, 0, 4],
            [2, 4, 2, 4],
        ]
    )
    # LEFT: rows merged leftward.
    left, score_l, _ = move(board, 0)
    np.testing.assert_array_equal(
        np.asarray(board_values(left)),
        [[4, 4, 0, 0], [4, 2, 0, 0], [8, 0, 0, 0], [2, 4, 2, 4]],
    )
    assert int(score_l) == 4 + 4 + 8

    # RIGHT is LEFT on the horizontally-flipped board.
    right, score_r, _ = move(board, 2)
    flipped_left, score_fl, _ = move(jnp.flip(board, axis=-1), 0)
    np.testing.assert_array_equal(
        np.asarray(right), np.asarray(jnp.flip(flipped_left, axis=-1))
    )
    assert int(score_r) == int(score_fl)

    # UP is LEFT on the transposed board.
    up, score_u, _ = move(board, 1)
    t_left, score_t, _ = move(jnp.swapaxes(board, -1, -2), 0)
    np.testing.assert_array_equal(
        np.asarray(up), np.asarray(jnp.swapaxes(t_left, -1, -2))
    )
    assert int(score_u) == int(score_t)


def test_move_all_matches_individual_moves():
    key = jax.random.PRNGKey(0)
    boards = jax.random.randint(key, (32, 4, 4), 0, 6, dtype=jnp.int32).astype(
        jnp.int8
    )
    all_b, all_s, all_m = move_all(boards)
    for a in range(4):
        b, s, m = move(boards, a)
        np.testing.assert_array_equal(np.asarray(all_b[a]), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(all_s[a]), np.asarray(s))
        np.testing.assert_array_equal(np.asarray(all_m[a]), np.asarray(m))


def test_select_move_gathers_per_board_action():
    key = jax.random.PRNGKey(1)
    boards = jax.random.randint(key, (16, 4, 4), 0, 5, dtype=jnp.int32).astype(
        jnp.int8
    )
    actions = jax.random.randint(jax.random.PRNGKey(2), (16,), 0, 4)
    all_b, all_s, all_m = move_all(boards)
    sel_b, sel_s, sel_m = select_move(all_b, all_s, all_m, actions)
    for i in range(16):
        a = int(actions[i])
        np.testing.assert_array_equal(np.asarray(sel_b[i]), np.asarray(all_b[a, i]))
        assert int(sel_s[i]) == int(all_s[a, i])
        assert bool(sel_m[i]) == bool(all_m[a, i])


# ---------------------------------------------------------------------------
# Spawn distribution (Game2048_env.py:16-20: uniform empty cell, 2 w.p. 0.9)
# ---------------------------------------------------------------------------


def test_spawn_only_fills_empty_cells():
    board = exps([[2, 0, 4, 0], [0, 0, 0, 0], [8, 8, 8, 8], [0, 2, 0, 2]])
    keys = jax.random.split(jax.random.PRNGKey(3), 256)
    spawned = jax.vmap(spawn_random_tile, in_axes=(None, 0))(board, keys)
    diff = np.asarray(spawned) - np.asarray(board)[None]
    # Exactly one cell changed per spawn, from 0, to exponent 1 or 2.
    changed = diff != 0
    assert (changed.sum(axis=(1, 2)) == 1).all()
    changed_vals = diff.sum(axis=(1, 2))
    assert set(np.unique(changed_vals)) <= {1, 2}
    # Spawned only into empty cells.
    empty_mask = np.asarray(board) == 0
    assert (changed <= empty_mask[None]).all()


def test_spawn_distribution():
    board = jnp.zeros((4, 4), dtype=jnp.int8).at[0, 0].set(1)
    n = 4000
    keys = jax.random.split(jax.random.PRNGKey(4), n)
    spawned = np.asarray(jax.vmap(spawn_random_tile, in_axes=(None, 0))(board, keys))
    diff = spawned - np.asarray(board)[None]
    vals = diff.sum(axis=(1, 2))
    frac_two = (vals == 1).mean()
    assert 0.87 < frac_two < 0.93  # p=0.9 for a "2"
    # Uniform over the 15 empty cells: each cell hit with p ~ 1/15.
    pos_counts = (diff != 0).sum(axis=0)
    assert pos_counts[0, 0] == 0
    expected = n / 15
    assert (np.abs(pos_counts[np.asarray(board) == 0] - expected) < 5 * np.sqrt(expected)).all()


def test_spawn_full_board_is_noop():
    board = exps([[2, 4, 2, 4], [4, 2, 4, 2], [2, 4, 2, 4], [4, 2, 4, 2]])
    out = spawn_random_tile(board, jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(board))


def test_init_board_has_two_tiles():
    keys = jax.random.split(jax.random.PRNGKey(6), 64)
    boards = jax.vmap(init_board)(keys)
    nonzero = (np.asarray(boards) != 0).sum(axis=(1, 2))
    assert (nonzero == 2).all()


# ---------------------------------------------------------------------------
# Game-over truth table
# ---------------------------------------------------------------------------


def test_game_over_cases():
    # Any empty cell -> not over.
    b1 = exps([[2, 4, 2, 4], [4, 2, 4, 2], [2, 4, 2, 4], [4, 2, 4, 0]])
    assert not bool(is_game_over(b1))
    # Full board, no adjacent equal -> over.
    b2 = exps([[2, 4, 2, 4], [4, 2, 4, 2], [2, 4, 2, 4], [4, 2, 4, 2]])
    assert bool(is_game_over(b2))
    assert not np.asarray(legal_moves_mask(b2)).any()
    # Full board with one horizontal merge available -> not over.
    b3 = exps([[2, 2, 8, 4], [4, 8, 4, 2], [2, 4, 2, 4], [4, 2, 4, 2]])
    assert not bool(is_game_over(b3))
    mask3 = np.asarray(legal_moves_mask(b3))
    assert mask3[0] and mask3[2] and not mask3[1] and not mask3[3]
    # Full board with one vertical merge available -> up/down only.
    b4 = exps([[2, 4, 2, 4], [2, 8, 4, 2], [4, 2, 8, 4], [8, 4, 2, 8]])
    mask4 = np.asarray(legal_moves_mask(b4))
    assert mask4[1] and mask4[3] and not mask4[0] and not mask4[2]


def test_max_tile_value():
    b = exps([[2, 0, 0, 0], [0, 1024, 0, 0], [0, 0, 0, 0], [0, 0, 0, 2]])
    assert int(max_tile_value(b)) == 1024
    assert int(max_tile_value(jnp.zeros((4, 4), jnp.int8))) == 0


# ---------------------------------------------------------------------------
# Differential test vs the ACTUAL reference engine (spawn stubbed out)
# ---------------------------------------------------------------------------


def _load_reference_engine():
    if REFERENCE_ENV_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_ENV_DIR)
    try:
        from Game2048_nopenalty_env import Game2048  # noqa: PLC0415
    except Exception as exc:  # pragma: no cover - env without reference tree
        pytest.skip(f"reference engine unavailable: {exc}")
    return Game2048


def test_differential_vs_reference_engine():
    Game2048 = _load_reference_engine()
    rng = np.random.RandomState(1234)
    game = Game2048.__new__(Game2048)  # skip __init__ (it spawns via RNG)
    for _ in range(300):
        values = 2 ** rng.randint(1, 8, size=(4, 4))
        values[rng.rand(4, 4) < 0.4] = 0
        action = rng.randint(0, 4)

        game.board = values.copy().astype(int)
        game.moved_board = np.zeros((4, 4), dtype=int)
        game.add_number = lambda board: None  # isolate merge from spawn
        ref_moved, ref_score = game.move(action)
        ref_board = game.moved_board

        ours_board, ours_score, ours_moved = move(
            values_to_exponents(jnp.asarray(values)), action
        )
        np.testing.assert_array_equal(
            np.asarray(board_values(ours_board)), ref_board
        )
        assert int(ours_score) == ref_score
        assert bool(ours_moved) == ref_moved


def test_differential_game_over_vs_reference():
    Game2048 = _load_reference_engine()
    rng = np.random.RandomState(99)
    for _ in range(200):
        values = 2 ** rng.randint(1, 5, size=(4, 4))
        if rng.rand() < 0.3:
            values[rng.rand(4, 4) < 0.2] = 0
        game = Game2048.__new__(Game2048)
        game.board = values.copy().astype(int)
        game.moved_board = np.zeros((4, 4), dtype=int)
        game.add_number = lambda board: None
        assert bool(is_game_over(values_to_exponents(jnp.asarray(values)))) == bool(
            game.is_game_over()
        )
