"""Trajectory-parity harness vs the reference environments.

BASELINE.json config 2 names "step-parity harness vs reference under fixed
seed" as a deliverable. This module drives the *actual* reference
environment (imported read-only from /root/reference — never copied) as an
oracle, extracts each step's random spawn decision by diffing boards, feeds
those decisions into our deterministic :func:`tpu2048.env.step_with_spawn`,
and asserts that board / reward / done / max-tile sequences match exactly.

This sidesteps the reference's tangled host-RNG consumption (probe moves in
``is_game_over`` draw from ``np.random``, Game2048_nopenalty_env.py:68-78)
— whatever the oracle drew, we observe its *effect* and replay it.

Reference call stacks being mirrored: SURVEY.md §3.1 (tabular / shaped env)
and §3.2's env interaction incl. the driver's board commit
(mainDQL_CNN_step2.py:237).
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field
from typing import List

import jax.numpy as jnp
import numpy as np

from tpu2048.env import env as envlib
from tpu2048.ops import board as board_ops

V1_DIR = "/root/reference/QLearningBase/environment"
V2_DIR = "/root/reference/Deep_QLearning/environment"


def load_reference_env(variant: str):
    """Import the reference Gym env class (v1 shaped / v2 simple)."""
    if variant == "v1":
        if V1_DIR not in sys.path:
            sys.path.insert(0, V1_DIR)
        import Game2048_env as mod  # noqa: PLC0415

        return mod.Game2048_env
    if variant == "v2":
        if V2_DIR not in sys.path:
            sys.path.insert(0, V2_DIR)
        import Game2048_nopenalty_env as mod  # noqa: PLC0415

        return mod.Game2048_env
    raise ValueError(variant)


@dataclass
class ParityResult:
    steps: int
    done: bool
    mismatches: List[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return not self.mismatches


def _extract_spawn(visible_merged_values: np.ndarray, post_values: np.ndarray):
    """Diff oracle post-board against the deterministic merge result.

    Returns ``(empty_idx, val_exponent)`` of the spawned tile, or
    ``(0, 0)`` if no tile spawned (invalid move).
    """
    diff = post_values.astype(np.int64) - visible_merged_values.astype(np.int64)
    nz = np.argwhere(diff != 0)
    if len(nz) == 0:
        return 0, 0
    assert len(nz) == 1, f"expected single spawn cell, got {nz}"
    r, c = nz[0]
    val = int(post_values[r, c])
    assert val in (2, 4), f"unexpected spawn value {val}"
    flat = r * 4 + c
    empties_before = int((visible_merged_values.reshape(-1)[:flat] == 0).sum())
    assert visible_merged_values[r, c] == 0
    return empties_before, 1 if val == 2 else 2


def run_parity(
    variant: str,
    seed: int,
    max_steps: int = 400,
    action_seed: int = 0,
    reward_atol: float = 2e-4,
) -> ParityResult:
    """Run one seeded episode on the reference env and replay it on ours.

    Args:
      variant: "v1" (shaped reward, QLearningBase) or "v2" (simple reward,
        Deep_QLearning — replayed with ``quirk_compat=True`` and the
        driver's manual board commit, mainDQL:237).
      seed: ``np.random.seed`` for the oracle's spawn stream.
      max_steps: cap on episode length.
      action_seed: seed for the (separate) action stream.

    Returns:
      :class:`ParityResult` with any mismatches described.
    """
    RefEnv = load_reference_env(variant)
    np.random.seed(seed)
    ref = RefEnv()

    config = envlib.EnvConfig(
        reward=envlib.SHAPED if variant == "v1" else envlib.SIMPLE,
        terminal_bonus=False,
        auto_reset=False,
        quirk_compat=(variant == "v2"),
    )
    import jax  # noqa: PLC0415

    state = envlib.reset(config, jax.random.PRNGKey(0), 1)
    # Overwrite the random initial board with the oracle's.
    state = state.replace(
        board=board_ops.values_to_exponents(
            np.asarray(ref.game.board)
        )[None].astype(jnp.int8)
    )

    actions = np.random.RandomState(action_seed)
    result = ParityResult(steps=0, done=False)

    for t in range(max_steps):
        action = int(actions.randint(0, 4))
        pre_values = np.asarray(ref.game.board).copy()

        ref_obs, ref_reward, ref_done, ref_max = ref.step(action)
        ref_obs = np.asarray(ref_obs)
        if variant == "v2":
            # The reference driver commits moved_board manually
            # (mainDQL_CNN_step2.py:237).
            ref.game.board = ref_obs.copy()

        # Deterministic merge of the visible board (accounting for the v2
        # full-board probe clobber the env reproduces in quirk_compat).
        pre_exp = board_ops.values_to_exponents(pre_values)
        merged, _, _ = board_ops.move(pre_exp, action)
        visible = np.asarray(board_ops.board_values(merged))
        if variant == "v2":
            pre_legal = np.asarray(board_ops.legal_moves_mask(pre_exp))
            full = (pre_values != 0).all()
            if full and pre_legal.any():
                first_legal = int(np.argmax(pre_legal))
                probe, _, _ = board_ops.move(pre_exp, first_legal)
                visible = np.asarray(board_ops.board_values(probe))
        spawn_idx, spawn_val = _extract_spawn(visible, ref_obs)

        state, ts = envlib.step_with_spawn(
            config,
            state,
            jnp.asarray([action], jnp.int32),
            jnp.asarray([spawn_idx], jnp.int32),
            jnp.asarray([spawn_val], jnp.int8),
        )
        result.steps = t + 1

        our_board = np.asarray(board_ops.board_values(ts.obs[0]))
        if not np.array_equal(our_board, ref_obs):
            result.mismatches.append(
                f"step {t}: board mismatch\nours:\n{our_board}\nref:\n{ref_obs}"
            )
            break
        if abs(float(ts.reward[0]) - float(ref_reward)) > reward_atol * max(
            1.0, abs(float(ref_reward))
        ):
            result.mismatches.append(
                f"step {t}: reward {float(ts.reward[0])} != {float(ref_reward)}"
            )
        if bool(ts.done[0]) != bool(ref_done):
            result.mismatches.append(
                f"step {t}: done {bool(ts.done[0])} != {bool(ref_done)}"
            )
            break
        if int(ts.max_number[0]) != int(ref_max):
            result.mismatches.append(
                f"step {t}: max {int(ts.max_number[0])} != {int(ref_max)}"
            )
        if bool(ref_done):
            result.done = True
            break
    return result
