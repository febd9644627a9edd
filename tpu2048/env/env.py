"""Batched, auto-resetting 2048 environment.

Pure-functional re-design of the reference's two Gym environments
(`Game2048_env` at /root/reference/QLearningBase/environment/Game2048_env.py:78-205
with the shaped reward, and /root/reference/Deep_QLearning/environment/
Game2048_nopenalty_env.py:81-150 with the simple reward): the environment is
a frozen config plus pure ``reset``/``step`` functions over an
:class:`EnvState` pytree with a leading batch dimension. Thousands of boards
step in lockstep under ``jit``; there is no Python control flow in the step.

Reference quirks (SURVEY.md §7 "fix, not copy") and how they are handled:

* v2's ``step`` never commits ``moved_board`` — the *driver* does
  (mainDQL_CNN_step2.py:237). Here the env commits its own state.
* v2 computes ``game_over`` on the PRE-move board (nopenalty:108 reads
  ``self.board`` while the move result sits in ``moved_board``), and when
  the pre-move board is full but playable, the probe loop inside
  ``is_game_over`` overwrites ``moved_board`` with the first legal probe
  move + a spawned tile, which ``step`` then returns (nopenalty:68-78,109,
  120). Default semantics here are the sane ones (game_over on the
  post-move board, no clobber); ``EnvConfig.quirk_compat=True`` reproduces
  the reference behavior bit-for-bit for the trajectory-parity harness.
* v1's ``reset`` does not reset ``previous_max`` or the stall counters
  (Game2048_env.py:187-191); faithful by default, fixable with
  ``EnvConfig.reset_shaping_on_reset=True``.
* The reference's legality probes consume host RNG; legality here is pure
  and consumes none.

Action encoding: 0=left, 1=up, 2=right, 3=down (Game2048_env.py:54).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from tpu2048.env import rewards as rw
from tpu2048.ops import board as board_ops

SHAPED = "shaped"
SIMPLE = "simple"


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """Static environment configuration (hashable; safe as a jit constant)."""

    reward: str = SIMPLE  # "shaped" (QLearningBase) or "simple" (Deep_QLearning)
    terminal_bonus: bool = False  # driver-side shaping, mainDQL:202-213
    auto_reset: bool = True
    quirk_compat: bool = False  # reproduce v2 pre-move game_over + probe clobber
    reset_shaping_on_reset: bool = False  # reset prev_max/stall counters on reset
    # Stall handling (shaped env only, Game2048_env.py:92-95,110-127).
    max_consecutive_actions: int = 10
    stall_force_done: int = 100

    def __post_init__(self):
        if self.reward not in (SHAPED, SIMPLE):
            raise ValueError(f"unknown reward variant {self.reward!r}")


@struct.dataclass
class EnvState:
    """Batched environment state. All leaves have leading dim B."""

    board: jax.Array  # (B, 4, 4) int8 exponents
    rng: jax.Array  # (B,) PRNG keys
    score: jax.Array  # (B,) int32 cumulative episode merge score (env.score)
    move_score: jax.Array  # (B,) int32 last move's merge score
    prev_max: jax.Array  # (B,) int32 running best max tile (shaped reward)
    consec_action: jax.Array  # (B,) int32 last action (-1 = none)
    consec_count: jax.Array  # (B,) int32 consecutive same-action count
    last_consec_penalty: jax.Array  # (B,) f32 growing stall penalty
    episode_return: jax.Array  # (B,) f32 cumulative reward this episode
    episode_steps: jax.Array  # (B,) int32 steps this episode
    done: jax.Array  # (B,) bool last step terminated the episode

    @property
    def batch_size(self) -> int:
        return self.board.shape[0]


@struct.dataclass
class TimeStep:
    """Per-step outputs (pre-auto-reset, so terminal info is observable).

    The reference's 4-tuple ``(board, reward, done, max_number)``
    (Game2048_env.py:129) widened with the fields its drivers recompute by
    hand: move validity (GameDemo.py:120), the legal-move mask
    (mainDQL:170-174), and episode aggregates for metrics.
    """

    obs: jax.Array  # (B, 4, 4) int8 board after the step
    reward: jax.Array  # (B,) f32
    done: jax.Array  # (B,) bool
    max_number: jax.Array  # (B,) int32 max tile value
    valid: jax.Array  # (B,) bool the move changed the board
    merge_score: jax.Array  # (B,) int32 raw merge score of the move
    legal_mask: jax.Array  # (B, 4) bool legal moves on the NEW board
    episode_return: jax.Array  # (B,) f32 return incl. this step
    episode_steps: jax.Array  # (B,) int32 length incl. this step


def _fresh_boards(key, batch_size: int):
    return jax.vmap(board_ops.init_board)(jax.random.split(key, batch_size))


def reset(config: EnvConfig, key, batch_size: int) -> EnvState:
    """Create a fresh batched environment state."""
    k_boards, k_state = jax.random.split(key)
    # Every leaf is a fresh buffer (no aliasing) so states are donatable.
    zi = lambda: jnp.zeros((batch_size,), jnp.int32)  # noqa: E731
    return EnvState(
        board=_fresh_boards(k_boards, batch_size),
        rng=jax.random.split(k_state, batch_size),
        score=zi(),
        move_score=zi(),
        prev_max=jnp.full((batch_size,), 2, jnp.int32),
        consec_action=jnp.full((batch_size,), -1, jnp.int32),
        consec_count=zi(),
        last_consec_penalty=jnp.full((batch_size,), -1.0, jnp.float32),
        episode_return=jnp.zeros((batch_size,), jnp.float32),
        episode_steps=zi(),
        done=jnp.zeros((batch_size,), bool),
    )


def step(config: EnvConfig, state: EnvState, action) -> Tuple[EnvState, TimeStep]:
    """Advance every environment by one action (RNG path)."""
    pairs = jax.vmap(lambda k: jax.random.split(k, 2))(state.rng)  # (B, 2, ...)
    new_rng, step_keys = pairs[:, 0], pairs[:, 1]
    state = state.replace(rng=new_rng)

    merged, merge_score, valid = _apply_action(state.board, action)
    quirk_pre = None
    if config.reward == SIMPLE and config.quirk_compat:
        # In quirk mode the spawn can land on the probe board (the
        # is_game_over clobber branch, nopenalty:68-78), whose empty count
        # differs from ``merged``'s — draw the spawn index from the board
        # actually spawned onto, else a full-but-playable board collapses
        # to a first-empty bias instead of uniform-over-empties.
        quirk_pre = _quirk_probe(state.board)
        pre_legal, clobber, probe_b, _ = quirk_pre
        visible = jnp.where(clobber[:, None, None], probe_b, merged)
        spawn_idx, spawn_val = jax.vmap(board_ops.sample_spawn)(
            visible, step_keys
        )
    else:
        spawn_idx, spawn_val = jax.vmap(board_ops.sample_spawn)(
            merged, step_keys
        )
    new_state, ts = step_with_spawn(
        config, state, action, spawn_idx, spawn_val,
        _precomputed=(merged, merge_score, valid, quirk_pre),
    )
    if config.auto_reset:
        k_reset = jax.vmap(lambda k: jax.random.fold_in(k, 1))(step_keys)
        new_state = _auto_reset(config, new_state, ts.done, k_reset)
    return new_state, ts


def _apply_action(board, action):
    cand_b, cand_s, cand_m = board_ops.move_all(board)
    return board_ops.select_move(cand_b, cand_s, cand_m, action)


def _quirk_probe(board):
    """Quirk-mode pre-move probe (nopenalty:68-78): legal mask of the
    PRE-move board, the full-but-playable "clobber" flag, and the
    first-legal-move probe board that is_game_over leaves behind.
    Computed once per step and threaded to step_with_spawn."""
    pre_legal = board_ops.legal_moves_mask(board)
    game_over = ~jnp.any(pre_legal, axis=-1)
    full = ~jnp.any(board == 0, axis=(-1, -2))
    clobber = full & ~game_over
    first_legal = jnp.argmax(pre_legal, axis=-1)
    probe_b, _, probe_m = _apply_action(board, first_legal)
    return pre_legal, clobber, probe_b, probe_m


def step_with_spawn(
    config: EnvConfig,
    state: EnvState,
    action,
    spawn_idx,
    spawn_val,
    _precomputed=None,
) -> Tuple[EnvState, TimeStep]:
    """Deterministic step: spawn decisions are explicit inputs.

    Used by the RNG path above, the trajectory-parity harness (which feeds
    spawn decisions extracted from the reference env), and interactive play.
    ``spawn_idx`` indexes the row-major empty cells of whichever board the
    spawn lands on; ``spawn_val`` is the exponent (1 or 2).
    """
    old_board = state.board
    action = jnp.asarray(action, jnp.int32)
    quirk_pre = None
    if _precomputed is None:
        merged, merge_score, valid = _apply_action(old_board, action)
    elif len(_precomputed) == 4:
        merged, merge_score, valid, quirk_pre = _precomputed
    else:
        merged, merge_score, valid = _precomputed

    if config.reward == SHAPED:
        # v1: the move commits and spawns immediately (Game2048_env.py:51-63);
        # game-over is evaluated on the post-move board.
        spawned = jax.vmap(board_ops.spawn_at)(merged, spawn_idx, spawn_val)
        new_board = jnp.where(valid[:, None, None], spawned, old_board)
        legal_new = board_ops.legal_moves_mask(new_board)
        game_over = ~jnp.any(legal_new, axis=-1)
        max_number = board_ops.max_tile_value(new_board)
        reward, new_prev_max = rw.shaped_reward(
            merge_score, valid, game_over, max_number, state.prev_max
        )
        # Stall bookkeeping (Game2048_env.py:110-127) — applied after the
        # base reward, exactly as in the reference.
        same = action == state.consec_action
        consec_count = jnp.where(same, state.consec_count + 1, 1)
        consec_action = action
        last_penalty = jnp.where(same, state.last_consec_penalty, -1.0)
        done = ~valid & game_over
        stalled = consec_count > config.max_consecutive_actions
        done = done | (consec_count > config.stall_force_done)
        penalty = jnp.maximum(last_penalty * 1.1, -10.0)
        last_penalty = jnp.where(stalled, penalty, last_penalty)
        reward = reward + jnp.where(stalled, penalty, 0.0)
        new_state = state.replace(
            prev_max=new_prev_max,
            consec_action=consec_action,
            consec_count=consec_count,
            last_consec_penalty=last_penalty,
        )
    else:
        if config.quirk_compat:
            # Reference v2: game_over on the PRE-move board; when that board
            # is full but playable, is_game_over's probe loop leaves
            # moved_board = first-legal-move(board) + spawn, and THAT board
            # is returned/committed (nopenalty:68-78,109,120).
            if quirk_pre is None:
                quirk_pre = _quirk_probe(old_board)
            pre_legal, clobber, probe_b, probe_m = quirk_pre
            game_over = ~jnp.any(pre_legal, axis=-1)
            visible_merged = jnp.where(clobber[:, None, None], probe_b, merged)
            spawn_board = jax.vmap(board_ops.spawn_at)(
                visible_merged, spawn_idx, spawn_val
            )
            spawn_happens = jnp.where(clobber, probe_m, valid)
            new_board = jnp.where(
                spawn_happens[:, None, None], spawn_board, visible_merged
            )
            # When the move was invalid and no clobber, board is unchanged
            # (moved_board == board.copy()).
            new_board = jnp.where(
                (clobber | valid)[:, None, None], new_board, old_board
            )
            legal_new = board_ops.legal_moves_mask(new_board)
        else:
            spawned = jax.vmap(board_ops.spawn_at)(merged, spawn_idx, spawn_val)
            new_board = jnp.where(valid[:, None, None], spawned, old_board)
            legal_new = board_ops.legal_moves_mask(new_board)
            game_over = ~jnp.any(legal_new, axis=-1)

        max_number = board_ops.max_tile_value(new_board)
        reward = rw.simple_reward(merge_score, valid, game_over)
        done = game_over
        if config.terminal_bonus:
            reward = reward + rw.terminal_bonus(
                rw.top2_tile_values(new_board), done
            )
        new_state = state

    episode_return = state.episode_return + reward
    episode_steps = state.episode_steps + 1
    new_state = new_state.replace(
        board=new_board,
        score=state.score + merge_score,
        move_score=merge_score,
        episode_return=episode_return,
        episode_steps=episode_steps,
        done=done,
    )
    ts = TimeStep(
        obs=new_board,
        reward=reward,
        done=done,
        max_number=max_number,
        valid=valid,
        merge_score=merge_score,
        legal_mask=legal_new,
        episode_return=episode_return,
        episode_steps=episode_steps,
    )
    return new_state, ts


def _auto_reset(config: EnvConfig, state: EnvState, done, reset_keys) -> EnvState:
    """Replace finished envs with fresh games.

    Faithful to the reference's ``reset`` (Game2048_env.py:187-191): score
    and board reset; shaping state (``prev_max``, stall counters) persists
    across episodes unless ``reset_shaping_on_reset`` is set.
    """
    fresh = jax.vmap(board_ops.init_board)(reset_keys)
    d3 = done[:, None, None]
    board = jnp.where(d3, fresh, state.board)
    sel = lambda new, old: jnp.where(done, new, old)  # noqa: E731
    zi = jnp.zeros_like(state.score)
    state = state.replace(
        board=board,
        score=sel(zi, state.score),
        move_score=sel(zi, state.move_score),
        episode_return=sel(jnp.zeros_like(state.episode_return), state.episode_return),
        episode_steps=sel(zi, state.episode_steps),
    )
    if config.reset_shaping_on_reset:
        state = state.replace(
            prev_max=sel(jnp.full_like(state.prev_max, 2), state.prev_max),
            consec_action=sel(jnp.full_like(state.consec_action, -1), state.consec_action),
            consec_count=sel(zi, state.consec_count),
            last_consec_penalty=sel(
                jnp.full_like(state.last_consec_penalty, -1.0),
                state.last_consec_penalty,
            ),
        )
    return state


class Game2048Env:
    """Thin OO wrapper bundling an :class:`EnvConfig` with the pure fns.

    The reference exposes ``env.reset()``/``env.step(action)``
    (Game2048_env.py:97,187); this wrapper keeps that ergonomic shape while
    all state flows explicitly through :class:`EnvState`.
    """

    def __init__(self, config: EnvConfig = EnvConfig()):
        self.config = config

    def reset(self, key, batch_size: int) -> EnvState:
        return reset(self.config, key, batch_size)

    def step(self, state: EnvState, action) -> Tuple[EnvState, TimeStep]:
        return step(self.config, state, action)

    def step_with_spawn(self, state, action, spawn_idx, spawn_val):
        return step_with_spawn(self.config, state, action, spawn_idx, spawn_val)
