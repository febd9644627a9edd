"""Fused Pallas env-step kernel tests (interpret mode on CPU).

Differential-tests the kernel against the pure-lax engine
(tpu2048.ops.board) on random boards and actions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu2048.env.fast import (
    FastEnvConfig,
    fast_reset,
    fast_step,
)
from tpu2048.ops import board as board_ops
from tpu2048.ops.pallas_step import (
    from_cell_major,
    fused_env_step,
    to_cell_major,
)

B = 256
BLK = 64


def random_boards(key, b=B):
    boards = jax.random.randint(key, (b, 4, 4), 0, 6, dtype=jnp.int32)
    mask = jax.random.uniform(jax.random.PRNGKey(7), (b, 4, 4)) < 0.35
    return jnp.where(mask, 0, boards).astype(jnp.int8)


def run_kernel(boards, actions, seed=0, **kw):
    b = boards.shape[0]
    bits = jax.random.bits(jax.random.PRNGKey(seed + 1000), (8, b), jnp.uint32)
    return fused_env_step(
        to_cell_major(boards),
        actions,
        seed,
        bits,
        block_size=BLK,
        interpret=True,
        **kw,
    )


def test_cell_major_roundtrip():
    boards = random_boards(jax.random.PRNGKey(0))
    np.testing.assert_array_equal(
        np.asarray(from_cell_major(to_cell_major(boards))), np.asarray(boards)
    )


def test_kernel_matches_lax_engine():
    boards = random_boards(jax.random.PRNGKey(1))
    actions = jax.random.randint(jax.random.PRNGKey(2), (B,), 0, 4)
    new_cm, score, valid, done, max_exp, second_exp, pre_reset = run_kernel(
        boards, actions, emit_pre_reset=True
    )
    # Oracle: lax engine.
    cand_b, cand_s, cand_m = board_ops.move_all(boards)
    ref_b, ref_s, ref_m = board_ops.select_move(cand_b, cand_s, cand_m, actions)

    np.testing.assert_array_equal(np.asarray(valid), np.asarray(ref_m))
    np.testing.assert_array_equal(np.asarray(score), np.asarray(ref_s))

    pre = np.asarray(from_cell_major(pre_reset))
    merged = np.asarray(ref_b)
    orig = np.asarray(boards)
    for i in range(B):
        if not bool(ref_m[i]):
            # Invalid move: board unchanged, no spawn.
            np.testing.assert_array_equal(pre[i], orig[i])
            continue
        diff = pre[i].astype(int) - merged[i].astype(int)
        nz = np.argwhere(diff != 0)
        assert len(nz) == 1, f"board {i}: expected 1 spawn, got {nz}"
        r, c = nz[0]
        assert merged[i][r, c] == 0  # spawned on an empty cell
        assert pre[i][r, c] in (1, 2)  # a 2 or a 4

    # done == no legal moves on the pre-reset board.
    for i in range(B):
        expect_done = bool(board_ops.is_game_over(jnp.asarray(pre[i])))
        assert bool(done[i]) == expect_done, i

    # Terminal stats from the pre-reset board.
    me = np.asarray(max_exp)
    se = np.asarray(second_exp)
    for i in range(B):
        flat = np.sort(pre[i].reshape(-1))[::-1]
        assert me[i] == flat[0]
        assert se[i] == flat[1]

    # Auto-reset: done lanes hold a fresh 2-tile board; others match pre.
    post = np.asarray(from_cell_major(new_cm))
    for i in range(B):
        if bool(done[i]):
            assert (post[i] != 0).sum() == 2
            assert set(np.unique(post[i])) <= {0, 1, 2}
        else:
            np.testing.assert_array_equal(post[i], pre[i])


def test_kernel_random_policy_picks_legal():
    boards = random_boards(jax.random.PRNGKey(3))
    actions = jnp.full((B,), -1, jnp.int32)
    # Kernel chooses the action internally; infer it from the result by
    # comparing with all four candidates.
    new_cm, score, valid, done, _, _, pre = run_kernel(
        boards, actions, seed=5, emit_pre_reset=True
    )
    cand_b, cand_s, cand_m = board_ops.move_all(boards)
    legal_any = np.asarray(jnp.any(cand_m, axis=0))
    pre_np = np.asarray(from_cell_major(pre))
    cand_np = np.asarray(cand_b)
    for i in range(B):
        if legal_any[i]:
            assert bool(valid[i]), f"board {i} had legal moves but none taken"
            # The merged board (pre minus the spawned tile) matches some
            # legal candidate.
            matches = 0
            for a in range(4):
                if not bool(cand_m[a, i]):
                    continue
                diff = pre_np[i].astype(int) - cand_np[a, i].astype(int)
                nz = np.argwhere(diff != 0)
                if len(nz) == 1 and cand_np[a, i][tuple(nz[0])] == 0:
                    matches += 1
            assert matches >= 1, i


def test_kernel_spawn_distribution():
    # Board of two exp-2 tiles ("4"s): left-merge makes one exp-3 tile, so
    # every exp-1/exp-2 cell afterwards is the spawn. P(exp 1) must be ~0.9.
    board = jnp.asarray(
        [[2, 2, 0, 0] + [0] * 12], jnp.int8
    ).reshape(1, 4, 4)
    boards = jnp.tile(board, (B, 1, 1))
    actions = jnp.zeros((B,), jnp.int32)
    twos = fours = 0
    for seed in range(6):
        _, _, _, _, _, _, pre = run_kernel(
            boards, actions, seed=seed, emit_pre_reset=True
        )
        vals = np.asarray(from_cell_major(pre)).reshape(B, 16)
        twos += int((vals == 1).sum())
        fours += int((vals == 2).sum())
    assert twos + fours == 6 * B  # exactly one spawn per board
    frac = twos / (twos + fours)
    assert 0.85 < frac < 0.95, (twos, fours)


def test_fast_env_rollout_interpret():
    config = FastEnvConfig(
        terminal_bonus=True, block_size=BLK, interpret=True, external_rng=True
    )
    state = fast_reset(config, jax.random.PRNGKey(0), B)
    total_done = 0
    for _ in range(60):
        state, ts = fast_step(config, state)
        total_done += int(np.asarray(ts.done).sum())
        assert np.isfinite(np.asarray(ts.reward)).all()
    # Random play on 256 envs for 60 steps: some episodes finish.
    assert total_done > 0
    assert (np.asarray(state.episode_steps) <= 60).all()
    # Scores accumulate and reset with episodes.
    assert int(np.asarray(state.score).sum()) > 0


def test_multi_step_rollout_equals_single_steps():
    """fused_env_rollout(k) ≡ k sequential fast_step calls, bit-for-bit.

    On the external-RNG path fast_rollout draws the identical per-step bit
    rows fast_step would at seed, seed+1, …, so the k-step window must
    reproduce the exact carried state (boards, per-episode score/steps/
    return) and its reward_sum/done_count must equal the sums of the
    per-step timesteps — across episode boundaries (auto-resets inside
    the window).
    """
    from tpu2048.env.fast import fast_rollout

    config = FastEnvConfig(
        terminal_bonus=True, block_size=BLK, interpret=True, external_rng=True
    )
    state = fast_reset(config, jax.random.PRNGKey(3), B)
    # Warm the state past fresh boards, then advance in k-step strides
    # until the upcoming window provably contains an episode reset — the
    # cross-reset claim must be exercised deterministically, not by luck.
    for _ in range(50):
        state, _ = fast_step(config, state)

    k = 6
    for _ in range(40):  # 40 * 6 = 240 more steps: ample for a game-over
        ref = state
        rsum = np.zeros((B,), np.int64)
        dcnt = np.zeros((B,), np.int64)
        for _ in range(k):
            ref, ts = fast_step(config, ref)
            rsum += np.asarray(ts.reward).astype(np.int64)
            dcnt += np.asarray(ts.done).astype(np.int64)
        if dcnt.sum() > 0:
            break
        state = ref  # no reset in this window; slide forward and retry
    assert dcnt.sum() > 0, "no k-step window crossed an episode reset"

    out, r, d = fast_rollout(config, state, k)
    np.testing.assert_array_equal(np.asarray(out.boards),
                                  np.asarray(ref.boards))
    np.testing.assert_array_equal(np.asarray(out.score),
                                  np.asarray(ref.score))
    np.testing.assert_array_equal(np.asarray(out.episode_steps),
                                  np.asarray(ref.episode_steps))
    np.testing.assert_allclose(np.asarray(out.episode_return),
                               np.asarray(ref.episode_return))
    np.testing.assert_array_equal(np.asarray(r), rsum)
    np.testing.assert_array_equal(np.asarray(d), dcnt)
    assert int(out.seed) == int(ref.seed)


def test_fast_env_sharded_equals_unsharded():
    """shard_map'd kernel over the 8-device CPU mesh: with external bits
    the sharded step equals the single-device step exactly."""
    from tpu2048.env.fast import make_sharded_kernel
    from tpu2048.parallel import MeshConfig, create_mesh, data_sharding

    config = FastEnvConfig(
        terminal_bonus=True, block_size=32, interpret=True, external_rng=True
    )
    state = fast_reset(config, jax.random.PRNGKey(0), B)
    ref_state, ref_ts = fast_step(config, state, need_obs=True)

    mesh = create_mesh(MeshConfig(data_parallel=8))
    kernel = make_sharded_kernel(config, mesh)
    sh = data_sharding(mesh)
    import jax as _jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    boards_sh = _jax.device_put(state.boards, NamedSharding(mesh, P(None, "data")))
    state2 = state.replace(boards=boards_sh)
    sh_state, sh_ts = fast_step(config, state2, sharded_kernel=kernel)

    np.testing.assert_array_equal(
        np.asarray(ref_state.boards), np.asarray(sh_state.boards)
    )
    np.testing.assert_array_equal(np.asarray(ref_ts.obs), np.asarray(sh_ts.obs))
    np.testing.assert_allclose(
        np.asarray(ref_ts.reward), np.asarray(sh_ts.reward)
    )
    np.testing.assert_array_equal(np.asarray(ref_ts.done), np.asarray(sh_ts.done))


def test_kernel_emit_legal_matches_lax_mask():
    """emit_legal: the kernel's post-reset legal mask equals the lax
    engine's legal_moves_mask on the returned board."""
    boards = random_boards(jax.random.PRNGKey(11))
    actions = jax.random.randint(jax.random.PRNGKey(12), (B,), 0, 4)
    new_cm, *_rest, legal = run_kernel(
        boards, actions, seed=3, emit_pre_reset=True, emit_legal=True
    )
    post = from_cell_major(new_cm)
    ref = board_ops.legal_moves_mask(post)  # (B, 4) bool
    np.testing.assert_array_equal(
        np.asarray(legal).T != 0, np.asarray(ref)
    )


def test_lax_backend_matches_kernel_bit_for_bit():
    """The pure-lax fast-step oracle consumes the same bit rows and
    reproduces the kernel's outputs exactly — including the in-kernel
    random-legal policy, spawn, second-max semantics, and auto-reset."""
    from tpu2048.env.fast import lax_fast_step

    for seed, mode in ((21, "given"), (22, "random_policy")):
        boards = random_boards(jax.random.PRNGKey(seed))
        if mode == "given":
            actions = jax.random.randint(
                jax.random.PRNGKey(seed + 1), (B,), 0, 4
            )
        else:
            actions = jnp.full((B,), -1, jnp.int32)
        bits = jax.random.bits(
            jax.random.PRNGKey(seed + 1000), (8, B), jnp.uint32
        )
        k_out = fused_env_step(
            to_cell_major(boards), actions, seed, bits, block_size=BLK,
            interpret=True, emit_pre_reset=True, emit_legal=True,
        )
        l_out = lax_fast_step(to_cell_major(boards), actions, bits)
        names = ["boards", "score", "valid", "done", "max_exp",
                 "second_exp", "pre_reset", "legal"]
        for name, k, l in zip(names, k_out, l_out):
            np.testing.assert_array_equal(
                np.asarray(k).astype(np.int32),
                np.asarray(l).astype(np.int32),
                err_msg=f"{mode}: {name} mismatch",
            )


def test_fast_env_lax_backend_equals_pallas_trajectory():
    """Multi-step fast_step trajectories agree between backends."""
    cfg_k = FastEnvConfig(terminal_bonus=True, block_size=BLK,
                          interpret=True, external_rng=True)
    cfg_l = FastEnvConfig(terminal_bonus=True, external_rng=True,
                          backend="lax")
    s_k = fast_reset(cfg_k, jax.random.PRNGKey(5), B)
    s_l = fast_reset(cfg_l, jax.random.PRNGKey(5), B)
    for i in range(40):
        actions = jax.random.randint(jax.random.PRNGKey(100 + i), (B,), 0, 4)
        s_k, ts_k = fast_step(cfg_k, s_k, actions, need_obs=True,
                              need_legal=True)
        s_l, ts_l = fast_step(cfg_l, s_l, actions, need_obs=True,
                              need_legal=True)
        np.testing.assert_array_equal(np.asarray(s_k.boards),
                                      np.asarray(s_l.boards))
        np.testing.assert_array_equal(np.asarray(s_k.legal),
                                      np.asarray(s_l.legal))
        np.testing.assert_array_equal(np.asarray(ts_k.obs),
                                      np.asarray(ts_l.obs))
        np.testing.assert_allclose(np.asarray(ts_k.reward),
                                   np.asarray(ts_l.reward))
        np.testing.assert_array_equal(np.asarray(ts_k.done),
                                      np.asarray(ts_l.done))


def test_rollout_eval_latch_kernel_equals_oracle():
    """fast_rollout_eval: the in-kernel first-completion latch + live
    action counts match the step-by-step lax oracle bit-for-bit on the
    external-RNG path, across multiple windows and episode resets."""
    from tpu2048.env.fast import eval_latch_init, fast_rollout_eval

    cfg_k = FastEnvConfig(terminal_bonus=True, block_size=BLK,
                          interpret=True, external_rng=True)
    cfg_o = FastEnvConfig(terminal_bonus=True, block_size=BLK,
                          interpret=True, external_rng=True, backend="lax")
    sk = fast_reset(cfg_k, jax.random.PRNGKey(5), B)
    so = sk
    lk = eval_latch_init(B)
    lo = eval_latch_init(B)
    total_latched = 0
    for _ in range(12):  # 12 windows x 8 steps = 96 steps: resets happen
        sk, lk = fast_rollout_eval(cfg_k, sk, lk, 8)
        so, lo = fast_rollout_eval(cfg_o, so, lo, 8)
        np.testing.assert_array_equal(np.asarray(sk.boards),
                                      np.asarray(so.boards))
        for f in ("latched", "score", "steps", "max_exp", "action_counts"):
            np.testing.assert_array_equal(
                np.asarray(getattr(lk, f)), np.asarray(getattr(lo, f)), f
            )
        total_latched = int(np.asarray(lk.latched).sum())
    assert total_latched > 0  # some games finished and latched
    # Latched lanes hold plausible stats; live counts only pre-latch.
    done = np.asarray(lk.latched) != 0
    assert (np.asarray(lk.score)[done] > 0).all()
    assert (np.asarray(lk.max_exp)[done] >= 3).all()
    # Action totals == sum of live steps across lanes.
    per_lane_actions = np.asarray(lk.action_counts).sum(axis=0)
    expect = np.where(done, np.asarray(lk.steps),
                      96 + 0 * per_lane_actions)
    # Unlatched lanes played all 96 steps; latched lanes may have played
    # more than their first episode's steps is false — they stop counting
    # at the latch, so counts == first-episode length.
    np.testing.assert_array_equal(per_lane_actions, expect)


def test_random_eval_uses_rollout_kernel_path():
    """evaluate() with the random policy routes through the latch-rollout
    kernel and returns sane distributions (random-play max tiles center
    on 64/128)."""
    import importlib

    ev = importlib.import_module("tpu2048.eval.evaluate")
    from tpu2048.env import EnvConfig

    res = ev.evaluate(
        ev.random_legal_policy(), 64, jax.random.PRNGKey(0),
        env_config=EnvConfig(reward="simple", auto_reset=False),
        batch_size=64,
    )
    assert len(res.scores) == 64
    assert res.action_counts.sum() == res.lengths.sum()
    assert 32 <= res.max_tiles.max() <= 512
    assert (res.scores > 0).all()
