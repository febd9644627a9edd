"""Environment behavior tests: rewards, stall logic, auto-reset, jit/scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu2048.env import (
    SHAPED,
    SIMPLE,
    EnvConfig,
    Game2048Env,
    normalize_reward,
    reset,
    simple_reward,
    step,
    step_with_spawn,
    terminal_bonus,
    top2_tile_values,
)
from tpu2048.ops import board_values, values_to_exponents


def make_state(config, values, key=None):
    """Build a B=1 EnvState holding the given face-value board."""
    st = reset(config, key or jax.random.PRNGKey(0), 1)
    return st.replace(
        board=values_to_exponents(jnp.asarray(values))[None].astype(jnp.int8)
    )


# ---------------------------------------------------------------------------
# Reward functions
# ---------------------------------------------------------------------------


def test_normalize_reward_matches_reference_formula():
    import math

    for r in [0.0, 0.5, 4.0, 100.0, 5000.0, 1e7, -0.1, -1.0, -10.0, -3000.0]:
        got = float(normalize_reward(jnp.float32(r)))
        if r >= 0:
            want = min(math.log2(r + 1), 10)
        else:
            want = -min(math.log2(abs(r - 1)), 10)
        assert got == pytest.approx(want, abs=1e-4), r


def test_simple_reward():
    score = jnp.asarray([8, 0, 0, 4])
    valid = jnp.asarray([True, False, False, True])
    over = jnp.asarray([False, False, True, True])
    r = simple_reward(score, valid, over)
    np.testing.assert_allclose(np.asarray(r), [8.0, -10.0, 0.0, 4.0])


def test_top2_and_terminal_bonus():
    b1 = values_to_exponents(
        jnp.asarray([[2048, 4, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]])
    )
    b2 = values_to_exponents(
        jnp.asarray([[1024, 1024, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]])
    )
    b3 = values_to_exponents(
        jnp.asarray([[1024, 512, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]])
    )
    boards = jnp.stack([b1, b2, b3])
    top2 = top2_tile_values(boards)
    np.testing.assert_array_equal(
        np.asarray(top2), [[2048, 4], [1024, 1024], [1024, 512]]
    )
    done = jnp.asarray([True, True, True])
    np.testing.assert_allclose(
        np.asarray(terminal_bonus(top2, done)), [100.0, 50.0, 0.0]
    )
    np.testing.assert_allclose(
        np.asarray(terminal_bonus(top2, jnp.zeros(3, bool))), [0.0, 0.0, 0.0]
    )


# ---------------------------------------------------------------------------
# Step semantics
# ---------------------------------------------------------------------------


def test_simple_step_invalid_move_penalty():
    config = EnvConfig(reward=SIMPLE, auto_reset=False)
    # Left move is illegal (all tiles against the left wall, no merges).
    state = make_state(
        config, [[2, 4, 8, 0], [4, 2, 16, 0], [8, 32, 2, 0], [2, 8, 4, 0]]
    )
    state, ts = step(config, state, jnp.asarray([0]))
    assert not bool(ts.valid[0])
    assert float(ts.reward[0]) == -10.0
    assert not bool(ts.done[0])
    # Board unchanged on invalid move.
    np.testing.assert_array_equal(
        np.asarray(board_values(ts.obs[0])),
        [[2, 4, 8, 0], [4, 2, 16, 0], [8, 32, 2, 0], [2, 8, 4, 0]],
    )


def test_simple_step_valid_move_scores_and_spawns():
    config = EnvConfig(reward=SIMPLE, auto_reset=False)
    state = make_state(
        config, [[2, 2, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]]
    )
    state, ts = step(config, state, jnp.asarray([0]))
    assert bool(ts.valid[0])
    assert float(ts.reward[0]) == 4.0
    assert int(ts.merge_score[0]) == 4
    out = np.asarray(board_values(ts.obs[0]))
    assert out[0, 0] == 4
    # Exactly one new tile spawned somewhere.
    assert (out != 0).sum() == 2
    assert int(state.score[0]) == 4


def test_shaped_step_stall_forces_done():
    config = EnvConfig(reward=SHAPED, auto_reset=False)
    state = make_state(
        config, [[2, 4, 8, 0], [4, 2, 16, 0], [8, 32, 2, 0], [2, 8, 4, 0]]
    )
    # Action 0 (left) is invalid forever on this board shape; repeat it.
    rewards = []
    done = False
    for t in range(120):
        state, ts = step(config, state, jnp.asarray([0]))
        rewards.append(float(ts.reward[0]))
        if bool(ts.done[0]):
            done = True
            break
    assert done
    assert t == 100  # count > 100 on the 101st repeat (0-indexed)
    # Stall penalties grow after 10 repeats: r[10] more negative than r[9].
    assert rewards[10] < rewards[9]
    assert rewards[30] < rewards[11]


def test_shaped_reward_progress_bonus_positive():
    config = EnvConfig(reward=SHAPED, auto_reset=False)
    state = make_state(
        config, [[2, 2, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]]
    )
    state, ts = step(config, state, jnp.asarray([0]))
    # merge to 4 > prev_max 2: bonus_progress = (2-1)*2^1.2; reward = log2(4+bonus+1)
    import math

    bonus = (2 - 1) * 2**1.2
    want = math.log2(4 + bonus + 1)
    assert float(ts.reward[0]) == pytest.approx(want, rel=1e-4)
    assert int(state.prev_max[0]) == 4


def test_terminal_bonus_applied_in_simple_env():
    config = EnvConfig(reward=SIMPLE, terminal_bonus=True, auto_reset=False)
    # Dead board with two 1024s: any move invalid, game over -> reward 0 + 50.
    state = make_state(
        config, [[1024, 512, 256, 128], [512, 1024, 128, 64],
                 [256, 128, 64, 32], [128, 64, 32, 16]]
    )
    state, ts = step(config, state, jnp.asarray([0]))
    assert bool(ts.done[0])
    assert float(ts.reward[0]) == 50.0


def test_auto_reset_replaces_dead_boards():
    config = EnvConfig(reward=SIMPLE, auto_reset=True)
    state = make_state(
        config, [[2, 4, 2, 4], [4, 2, 4, 2], [2, 4, 2, 4], [4, 2, 4, 2]]
    )
    state, ts = step(config, state, jnp.asarray([0]))
    assert bool(ts.done[0])
    # ts.obs shows the terminal board; state.board holds a fresh game.
    assert (np.asarray(ts.obs[0]) != 0).all()
    fresh = np.asarray(state.board[0])
    assert (fresh != 0).sum() == 2
    assert int(state.score[0]) == 0
    assert int(state.episode_steps[0]) == 0


def test_quirk_compat_game_over_is_premove():
    config = EnvConfig(reward=SIMPLE, quirk_compat=True, auto_reset=False)
    # Dead board: v2 reports done immediately (pre-move check).
    state = make_state(
        config, [[2, 4, 2, 4], [4, 2, 4, 2], [2, 4, 2, 4], [4, 2, 4, 2]]
    )
    state, ts = step(config, state, jnp.asarray([1]))
    assert bool(ts.done[0])
    assert float(ts.reward[0]) == 0.0  # invalid & game_over -> score (0)
    # Fixed mode on a playable-but-full board: done stays False; quirk mode
    # clobbers the move with the first legal probe.
    config2 = EnvConfig(reward=SIMPLE, quirk_compat=True, auto_reset=False)
    full_playable = [[2, 2, 8, 4], [4, 8, 4, 2], [2, 4, 2, 4], [4, 2, 4, 2]]
    state2 = make_state(config2, full_playable)
    state2, ts2 = step(config2, state2, jnp.asarray([1]))  # UP is illegal
    assert not bool(ts2.done[0])
    out = np.asarray(board_values(ts2.obs[0]))
    # Probe clobber: first legal move is LEFT (action 0) -> row 0 merges.
    assert out[0, 0] == 4 and out[0, 1] == 8


def test_quirk_clobber_rng_spawn_uniform_over_probe_empties():
    """RNG-path quirk mode: in the clobber branch the spawn index must be
    uniform over the PROBE board's empty cells (the board actually spawned
    onto), not biased by the merged board's differing empty count
    (VERDICT r1 weak-point 5; nopenalty:68-78)."""
    config = EnvConfig(reward=SIMPLE, quirk_compat=True, auto_reset=False)
    # Full but playable: every row merges left -> probe board has 8 empties
    # (two per row, columns 2-3).
    full_playable = [[2, 2, 4, 4], [8, 8, 16, 16], [32, 32, 64, 64],
                     [128, 128, 2, 2]]
    B = 4096
    state = reset(config, jax.random.PRNGKey(3), B)
    board = values_to_exponents(jnp.asarray(full_playable)).astype(jnp.int8)
    state = state.replace(board=jnp.tile(board[None], (B, 1, 1)))
    # UP is illegal on this board; quirk mode clobbers with the first legal
    # probe (LEFT) and spawns on that probe board.
    state, ts = jax.jit(lambda s: step(config, s, jnp.full((B,), 1)))(state)
    obs = np.asarray(board_values(ts.obs))  # (B, 4, 4)
    # Probe-left merge of the row [x, x, y, y] is [2x, 2y, 0, 0].
    probe = np.asarray(
        [[4, 8, 0, 0], [16, 32, 0, 0], [64, 128, 0, 0], [256, 4, 0, 0]]
    )
    diff = obs != probe[None]
    # Exactly one spawned tile per env, always on a probe-empty cell.
    assert (diff.sum(axis=(1, 2)) == 1).all()
    rows, cols = np.nonzero(diff)[1].reshape(B), np.nonzero(diff)[2].reshape(B)
    assert (cols >= 2).all()
    # Uniform over the 8 empty cells: each within 25% of B/8, none zero.
    flat = rows * 2 + (cols - 2)
    counts = np.bincount(flat, minlength=8)
    assert counts.min() > 0
    expected = B / 8
    assert (np.abs(counts - expected) < 0.25 * expected).all(), counts


def test_env_steps_under_scan_and_jit():
    config = EnvConfig(reward=SIMPLE, auto_reset=True)
    env = Game2048Env(config)
    B, T = 64, 50
    state = env.reset(jax.random.PRNGKey(0), B)

    @jax.jit
    def rollout(state, keys):
        def body(st, key):
            action = jax.random.randint(key, (B,), 0, 4)
            st, ts = step(config, st, action)
            return st, (ts.reward, ts.done)

        return jax.lax.scan(body, state, keys)

    keys = jax.random.split(jax.random.PRNGKey(1), T)
    state, (rews, dones) = rollout(state, keys)
    assert rews.shape == (T, B)
    assert np.isfinite(np.asarray(rews)).all()
    # With random actions over 50 steps, scores should be accumulating.
    assert int(np.asarray(state.score).sum()) > 0


# ---------------------------------------------------------------------------
# Trajectory parity vs the actual reference envs (BASELINE config 2)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 1, 2, 7])
def test_parity_v2_simple(seed):
    from tpu2048.env.parity import run_parity

    res = run_parity("v2", seed=seed, max_steps=300, action_seed=seed + 100)
    assert res.ok, "\n".join(res.mismatches)
    assert res.steps > 10


@pytest.mark.parametrize("seed", [3, 11])
def test_parity_v1_shaped(seed):
    from tpu2048.env.parity import run_parity

    res = run_parity("v1", seed=seed, max_steps=200, action_seed=seed + 5)
    assert res.ok, "\n".join(res.mismatches)
    assert res.steps > 10
