"""Reward functions — pure, batched re-implementations of the reference's.

Two variants exist in the reference and both are reproduced here as pure
``jnp`` functions selectable per-config (SURVEY.md §2 rows 3-4):

* :func:`shaped_reward` — ``Game2048_env.calculate_reward`` +
  ``update_and_normalize`` (/root/reference/QLearningBase/environment/
  Game2048_env.py:136-205): merge score plus level-progress bonus on a new
  max tile, milestone bonus >= 512, terminal bonus/penalty by max tile,
  invalid-move penalty, then signed log2 normalization clipped at +/-10.
* :func:`simple_reward` — ``Game2048_env.calculate_reward2``
  (/root/reference/Deep_QLearning/environment/Game2048_nopenalty_env.py:
  122-138): -10 for an invalid non-terminal move, else the raw merge score.
* :func:`terminal_bonus` — the terminal shaping the reference's DQN driver
  applies *outside* the env (mainDQL_CNN_step2.py:202-213): +100 for
  reaching 2048, +50 for two 1024s. It belongs in the env (documented
  behavioral delta, SURVEY.md §7 item 2) and is applied when
  ``EnvConfig.terminal_bonus`` is set.

All functions take/return batched arrays and are jit/vmap-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

SCALING_FACTOR = 1.2  # Game2048_env.py:91


def _log2(x):
    return jnp.log2(x.astype(jnp.float32))


def normalize_reward(reward):
    """Signed log2 normalization (Game2048_env.py:197-205).

    ``r >= 0 -> min(log2(r + 1), 10)``; ``r < 0 -> -min(log2(|r - 1|), 10)``.
    """
    pos = jnp.minimum(_log2(reward + 1.0), 10.0)
    neg = -jnp.minimum(_log2(jnp.abs(reward - 1.0)), 10.0)
    return jnp.where(reward >= 0, pos, neg)


def shaped_reward(score, valid, game_over, max_number, prev_max):
    """Level-progress shaped reward (Game2048_env.py:136-184).

    Args:
      score: ``(B,)`` int32 merge score of the move.
      valid: ``(B,)`` bool — the move changed the board.
      game_over: ``(B,)`` bool — no move is possible on the post-move board.
      max_number: ``(B,)`` int32 max tile value on the post-move board.
      prev_max: ``(B,)`` int32 running best max tile (the reference's
        ``previous_max``, initialized to 2 and — faithfully — *not* reset
        between episodes, Game2048_env.py:87,187-191).

    Returns:
      ``(reward, new_prev_max)``: normalized f32 reward and the updated
      running max.
    """
    score = score.astype(jnp.float32)
    max_number = jnp.maximum(max_number, 2)  # Game2048_env.py:141
    level = _log2(max_number)

    improved = max_number > prev_max
    bonus_progress = jnp.where(
        improved,
        (level - _log2(jnp.maximum(prev_max, 1))) * level**SCALING_FACTOR,
        0.0,
    )
    new_prev_max = jnp.where(improved, max_number, prev_max)

    # Invalid-move branch (Game2048_env.py:152-164).
    is_exact_milestone = (
        (max_number == 512) | (max_number == 1024) | (max_number == 2048)
    )
    invalid_terminal = jnp.where(
        is_exact_milestone,
        bonus_progress + level**SCALING_FACTOR,
        -_log2(max_number + 1),
    )
    invalid_nonterminal = -0.1 * level
    invalid_reward = jnp.where(game_over, invalid_terminal, invalid_nonterminal)

    # Valid-move branch (Game2048_env.py:165-177). bonus_progress is never
    # negative, so the reference's elif-== -0 collapses to a select.
    valid_reward = (
        score
        + jnp.where(bonus_progress > 0, bonus_progress, level * 0.05)
        + jnp.where(max_number >= 512, (level**SCALING_FACTOR) * 2.0, 0.0)
    )

    reward = jnp.where(valid, valid_reward, invalid_reward)
    return normalize_reward(reward), new_prev_max


def simple_reward(score, valid, game_over):
    """No-penalty reward (Game2048_nopenalty_env.py:122-138).

    ``-10`` when the move is invalid and the game is not over, else the raw
    merge score.
    """
    return jnp.where(
        ~valid & ~game_over, jnp.float32(-10.0), score.astype(jnp.float32)
    )


def terminal_bonus(board_values_sorted_top2, done):
    """Driver-side terminal shaping (mainDQL_CNN_step2.py:202-213).

    +100 when the final max tile >= 2048; +50 when it is >= 1024 *and* the
    second-largest tile is also >= 1024; else 0. Applied only on ``done``.

    Args:
      board_values_sorted_top2: ``(B, 2)`` int32, columns = (max tile value,
        second-largest tile value) of the final board.
      done: ``(B,)`` bool.
    """
    final = board_values_sorted_top2[..., 0]
    semi = board_values_sorted_top2[..., 1]
    bonus = jnp.where(
        final >= 2048,
        100.0,
        jnp.where((final >= 1024) & (semi >= 1024), 50.0, 0.0),
    )
    return jnp.where(done, bonus, 0.0).astype(jnp.float32)


def top2_tile_values(board):
    """``(..., 2)`` int32 (max, second-max) tile values of a board.

    Matches ``np.sort(next_state.flatten())[-2]`` in the reference driver
    (mainDQL_CNN_step2.py:204): duplicates count, so two 1024 tiles yield
    (1024, 1024).
    """
    exp = board.reshape(*board.shape[:-2], 16).astype(jnp.int32)
    vals = jnp.where(exp > 0, jnp.left_shift(jnp.int32(1), exp), 0)
    m1 = jnp.max(vals, axis=-1)
    # Second max including duplicates: mask out ONE occurrence of the max.
    is_max = vals == m1[..., None]
    first_max = jnp.cumsum(is_max.astype(jnp.int32), axis=-1) == 1
    masked = jnp.where(is_max & first_max, -1, vals)
    m2 = jnp.maximum(jnp.max(masked, axis=-1), 0)
    return jnp.stack([m1, m2], axis=-1)
