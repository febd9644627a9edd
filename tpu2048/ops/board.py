"""Batched 2048 board operations: moves, legality, spawn, game-over.

Re-implements the reference engine's board-level API
(Game2048 at /root/reference/QLearningBase/environment/Game2048_env.py:10-75
and /root/reference/Deep_QLearning/environment/Game2048_nopenalty_env.py:10-78)
as pure functions over ``(..., 4, 4)`` int8 exponent boards:

* ``move``/``move_all`` replace the reference's rotate→merge-left→rotate-back
  loop (Game2048_env.py:51-63) with static flips/transposes — no Python
  rotation loops, no in-place mutation, jit/vmap-safe.
* The reference's ``trial=True`` probe move (nopenalty:53) is simply a call
  to a pure function whose result you don't commit — it is free here.
* ``legal_moves_mask``/``is_game_over`` replace the reference's quadruple
  probe-with-restore (Game2048_env.py:65-75), which also consumed RNG by
  spawning into probe boards (nopenalty:68-78). Here legality is computed
  from the four candidate boards with **no RNG consumption** — a documented
  behavioral fix (SURVEY.md §7 "quirks to fix, not copy").
* ``spawn_random_tile`` implements the reference's ``add_number``
  (Game2048_env.py:16-20): uniform choice over empty cells, value 2 with
  p=0.9 else 4 — here with per-board ``jax.random`` keys and a gather-free
  one-hot write so thousands of boards spawn in lockstep.

Actions follow the reference encoding (Game2048_env.py:54):
``0 = left, 1 = up, 2 = right, 3 = down``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu2048.ops.rows import merge_rows_left

NUM_ACTIONS = 4

# Action encoding (matches np.rot90-based reference semantics).
LEFT, UP, RIGHT, DOWN = 0, 1, 2, 3


def _to_left_frame(board, action: int):
    """View ``board`` so that moving `action` becomes a left move on rows."""
    if action == LEFT:
        return board
    if action == UP:
        return jnp.swapaxes(board, -1, -2)
    if action == RIGHT:
        return jnp.flip(board, axis=-1)
    if action == DOWN:
        return jnp.flip(jnp.swapaxes(board, -1, -2), axis=-1)
    raise ValueError(f"invalid action {action}")


def _from_left_frame(board, action: int):
    if action == LEFT:
        return board
    if action == UP:
        return jnp.swapaxes(board, -1, -2)
    if action == RIGHT:
        return jnp.flip(board, axis=-1)
    if action == DOWN:
        return jnp.swapaxes(jnp.flip(board, axis=-1), -1, -2)
    raise ValueError(f"invalid action {action}")


def move(board, action: int):
    """Apply one of the 4 moves (static `action`) without spawning.

    Args:
      board: ``(..., 4, 4)`` int8 exponent board.

    Returns:
      ``(new_board, score, moved)``: board after slide+merge (pre-spawn),
      int32 merge score per board, bool "the move changed the board".
    """
    framed = _to_left_frame(board, action)
    merged, row_scores, row_moved = merge_rows_left(framed)
    new_board = _from_left_frame(merged, action)
    score = jnp.sum(row_scores, axis=-1)
    moved = jnp.any(row_moved, axis=-1)
    return new_board, score, moved


def move_all(board):
    """Compute all four candidate moves at once (pre-spawn).

    Returns:
      ``boards``: ``(4, ..., 4, 4)`` int8 — candidate board per action.
      ``scores``: ``(4, ...)`` int32 merge scores.
      ``moved``:  ``(4, ...)`` bool legality mask (the reference's
      ``trial=True`` probe loop, mainDQL_CNN_step2.py:170-174).
    """
    boards, scores, moveds = [], [], []
    for a in range(NUM_ACTIONS):
        b, s, m = move(board, a)
        boards.append(b)
        scores.append(s)
        moveds.append(m)
    return jnp.stack(boards), jnp.stack(scores), jnp.stack(moveds)


def select_move(boards, scores, moveds, action):
    """Select per-board results for a traced per-board action.

    Args:
      boards/scores/moveds: outputs of :func:`move_all` with batch shape
        ``(4, B, 4, 4)`` / ``(4, B)`` / ``(4, B)``.
      action: ``(B,)`` int32 in [0, 4).

    Returns:
      ``(board, score, moved)`` with shapes ``(B, 4, 4)``, ``(B,)``, ``(B,)``.
    """
    onehot = jax.nn.one_hot(action, NUM_ACTIONS, dtype=jnp.int8, axis=0)
    # (4, B) masks; elementwise select avoids gathers on TPU.
    sel_b = jnp.sum(boards * onehot[..., None, None], axis=0).astype(jnp.int8)
    sel_s = jnp.sum(scores * onehot.astype(scores.dtype), axis=0)
    sel_m = jnp.sum(moveds.astype(jnp.int8) * onehot, axis=0).astype(bool)
    return sel_b, sel_s, sel_m


def legal_moves_mask(board):
    """``(..., 4)`` bool mask of actions that change the board."""
    _, _, moved = move_all(board)
    return jnp.moveaxis(moved, 0, -1)


def is_game_over(board):
    """True when no action changes the board (Game2048_env.py:65-75).

    Equivalent to ``~any(move_all(board).moved)`` but O(1) ops instead of
    four probe merges: a board has a legal move iff it has an empty cell or
    an adjacent equal pair (if some row mixes empty and nonzero, left/right
    moves; otherwise every row is all-full or all-empty, so up/down moves
    tiles between them). Zero-zero "pairs" are subsumed by the empty check.
    """
    axes = (-2, -1)
    has_empty = jnp.any(board == 0, axis=axes)
    h_pair = jnp.any(board[..., :, :-1] == board[..., :, 1:], axis=axes)
    v_pair = jnp.any(board[..., :-1, :] == board[..., 1:, :], axis=axes)
    return ~(has_empty | h_pair | v_pair)


def sample_spawn(board, key):
    """Draw a spawn decision for ``board``: which empty cell, which value.

    Distributionally equivalent to the reference's ``add_number``
    (Game2048_env.py:16-20): uniform over empty cells in row-major order,
    value 2 with p=0.9 else 4.

    Args:
      board: ``(4, 4)`` int8 exponent board.
      key: PRNG key.

    Returns:
      ``(empty_idx, val)``: int32 index into the row-major sequence of empty
      cells (0-based) and int8 exponent (1 or 2) to place there.
    """
    empty = board.reshape(16) == 0
    n_empty = jnp.sum(empty.astype(jnp.int32))
    k_pos, k_val = jax.random.split(key)
    idx = jax.random.randint(k_pos, (), 0, jnp.maximum(n_empty, 1))
    val = jnp.where(jax.random.uniform(k_val) < 0.9, 1, 2).astype(jnp.int8)
    return idx, val


def spawn_at(board, empty_idx, val):
    """Place ``val`` on the ``empty_idx``-th empty cell (row-major).

    Deterministic half of the spawn — the parity harness feeds it decisions
    extracted from the reference environment, the RNG path feeds it
    :func:`sample_spawn`. No-op if the board has no empty cell. Gather-free:
    the write is a one-hot select, so it batches under ``vmap`` with no
    scatters.

    Args:
      board: ``(4, 4)`` int8 exponent board.
      empty_idx: int32 index among empty cells (row-major).
      val: int8 exponent to place (1 for "2", 2 for "4").

    Returns:
      ``(4, 4)`` int8 board.
    """
    flat = board.reshape(16)
    empty = flat == 0
    n_empty = jnp.sum(empty.astype(jnp.int32))
    csum = jnp.cumsum(empty.astype(jnp.int32))
    target = (csum == empty_idx + 1) & empty
    new_flat = jnp.where(target & (n_empty > 0), jnp.int8(val), flat)
    return new_flat.reshape(4, 4)


def spawn_random_tile(board, key):
    """Spawn a 2 (p=0.9) or 4 (p=0.1) on a uniformly-random empty cell.

    Pure equivalent of the reference's ``add_number`` (Game2048_env.py:16-20).
    Single-board function — ``vmap`` it with per-board split keys for the
    batched path. If the board has no empty cell, it is returned unchanged.
    """
    idx, val = sample_spawn(board, key)
    return spawn_at(board, idx, val)


def init_board(key):
    """Fresh game board: two spawned tiles (Game2048_env.py:11-14)."""
    k1, k2 = jax.random.split(key)
    board = jnp.zeros((4, 4), dtype=jnp.int8)
    board = spawn_random_tile(board, k1)
    board = spawn_random_tile(board, k2)
    return board


def max_tile_value(board):
    """``(...,)`` int32 value of the highest tile (0 for an empty board)."""
    e = jnp.max(board, axis=(-1, -2)).astype(jnp.int32)
    return jnp.where(e > 0, jnp.left_shift(jnp.int32(1), e), 0)


def board_values(board):
    """``(..., 4, 4)`` int32 face values (0 for empty cells)."""
    e = board.astype(jnp.int32)
    return jnp.where(e > 0, jnp.left_shift(jnp.int32(1), e), 0)


def values_to_exponents(values):
    """Inverse of :func:`board_values` — int face values → int8 exponents."""
    values = jnp.asarray(values, dtype=jnp.int32)
    # log2 via bit length: exponent = round(log2(v)) for powers of two.
    exp = jnp.where(
        values > 0,
        jnp.log2(jnp.maximum(values, 1).astype(jnp.float32)).astype(jnp.int32),
        0,
    )
    return exp.astype(jnp.int8)
