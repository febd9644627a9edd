"""Shaped-reward fast engine: differential tests.

The shaped env (QLearningBase, Game2048_env.py:78-205) now runs on the
fused Pallas step kernel (shaped mode: v1 done semantics + stall
force-done in-kernel, reward/penalty/prev-max lanes outside). These tests
pin two guarantees:

1. Kernel ("pallas", interpret on CPU) == op-by-op oracle ("lax")
   BIT-IDENTICALLY on the external-RNG path, through full multi-step
   shaped trajectories including episode resets and stall cutoffs.
2. The shaped fast step == the classic lax env
   (tpu2048.env.env.step_with_spawn, SHAPED branch) bit-for-bit when
   driven with the same boards/actions/spawn draws — i.e. the fast path
   implements the reference semantics exactly, not approximately.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpu2048.env import EnvConfig, SHAPED
from tpu2048.env import env as envlib
from tpu2048.env.fast import (
    FastEnvConfig, ShapedFastEnvState, fast_reset, fast_step,
)
from tpu2048.ops import board as board_ops
from tpu2048.ops import pallas_step as ps

B = 128
BLK = 64


def shaped_cfg(**kw):
    defaults = dict(
        shaped=True, block_size=BLK, interpret=True, external_rng=True
    )
    defaults.update(kw)
    return FastEnvConfig(**defaults)


def sticky_actions(key, prev, b):
    """Action stream biased to repeat (p=.75) so stall counters engage."""
    k1, k2 = jax.random.split(key)
    fresh = jax.random.randint(k2, (b,), 0, 4)
    repeat = jax.random.uniform(k1, (b,)) < 0.75
    return jnp.where(repeat, prev, fresh).astype(jnp.int32)


def test_shaped_kernel_equals_lax_oracle():
    """pallas (interpret) vs lax backend: bit-identical shaped
    trajectories — boards, rewards, dones, and every shaping lane —
    across resets and stall-forced episode ends."""
    cfg_k = shaped_cfg(backend="pallas")
    cfg_o = shaped_cfg(backend="lax")
    # Tight stall knobs so both stalled-penalty and force-done fire
    # within the horizon.
    cfg_k = dataclasses.replace(cfg_k, max_consecutive_actions=3,
                                stall_force_done=9)
    cfg_o = dataclasses.replace(cfg_o, max_consecutive_actions=3,
                                stall_force_done=9)
    sk = fast_reset(cfg_k, jax.random.PRNGKey(0), B)
    so = sk  # identical start
    key = jax.random.PRNGKey(42)
    act = jnp.zeros((B,), jnp.int32)
    saw_done = saw_stall = False
    for t in range(60):
        key, ka = jax.random.split(key)
        act = sticky_actions(ka, act, B)
        sk, tk = fast_step(cfg_k, sk, act, need_obs=True, need_legal=True)
        so, to = fast_step(cfg_o, so, act, need_obs=True, need_legal=True)
        np.testing.assert_array_equal(np.asarray(sk.boards),
                                      np.asarray(so.boards))
        np.testing.assert_array_equal(np.asarray(tk.obs), np.asarray(to.obs))
        np.testing.assert_array_equal(np.asarray(tk.done), np.asarray(to.done))
        np.testing.assert_array_equal(np.asarray(tk.reward),
                                      np.asarray(to.reward))
        np.testing.assert_array_equal(np.asarray(sk.legal),
                                      np.asarray(so.legal))
        for f in ("prev_max", "consec_count", "last_consec_penalty",
                  "score", "episode_return", "episode_steps"):
            np.testing.assert_array_equal(
                np.asarray(getattr(sk, f)), np.asarray(getattr(so, f)), f
            )
        saw_done |= bool(np.asarray(tk.done).any())
        saw_stall |= bool((np.asarray(sk.consec_count) > 3).any())
    assert saw_done and saw_stall  # the horizon exercised both mechanisms


def test_shaped_fast_equals_classic_env_stepwise():
    """fast shaped step == envlib.step_with_spawn (SHAPED) bit-for-bit
    when teacher-forced onto the same boards/actions/spawns.

    Every per-step output (reward incl. normalization and stall penalty,
    done, pre-reset board, max_number) and every carried shaping lane
    (prev_max, consec counters, penalty ladder) must match the classic
    env exactly — the fast path implements the reference formulas via the
    SAME rewards module, so equality is exact, not approximate.
    """
    cfg = shaped_cfg(backend="lax", max_consecutive_actions=3,
                     stall_force_done=9)
    env_cfg = EnvConfig(reward=SHAPED, max_consecutive_actions=3,
                        stall_force_done=9)
    fs = fast_reset(cfg, jax.random.PRNGKey(1), B)
    key = jax.random.PRNGKey(7)
    act = jnp.zeros((B,), jnp.int32)
    dummy_rng = jax.random.split(jax.random.PRNGKey(0), B)
    saw_done = saw_stall = saw_invalid = False
    for t in range(50):
        key, ka = jax.random.split(key)
        act = sticky_actions(ka, act, B)
        boards = ps.from_cell_major(fs.boards)

        # Classic state teacher-forced from the fast state.
        cstate = envlib.EnvState(
            board=boards,
            rng=dummy_rng,
            score=fs.score,
            move_score=jnp.zeros((B,), jnp.int32),
            prev_max=fs.prev_max,
            consec_action=fs.consec_action,
            consec_count=fs.consec_count,
            last_consec_penalty=fs.last_consec_penalty,
            episode_return=fs.episode_return,
            episode_steps=fs.episode_steps,
            done=jnp.zeros((B,), bool),
        )
        # Decode the spawn draws the fast step will consume.
        bits = jax.random.bits(
            jax.random.fold_in(jax.random.PRNGKey(2048), fs.seed),
            (8, B), jnp.uint32,
        )
        merged, _, _ = board_ops.select_move(*board_ops.move_all(boards),
                                             act)
        n_empty = jnp.sum((merged == 0).astype(jnp.int32), axis=(-1, -2))
        idx = ps._uniform_mod(bits[2], n_empty)
        val = ps._tile_value(bits[3]).astype(jnp.int8)
        cnew, cts = envlib.step_with_spawn(env_cfg, cstate, act, idx, val)

        fs, fts = fast_step(cfg, fs, act, need_obs=True)
        np.testing.assert_array_equal(
            np.asarray(ps.from_cell_major(fts.obs)), np.asarray(cts.obs)
        )
        np.testing.assert_array_equal(np.asarray(fts.reward),
                                      np.asarray(cts.reward))
        np.testing.assert_array_equal(np.asarray(fts.done),
                                      np.asarray(cts.done))
        np.testing.assert_array_equal(np.asarray(fts.max_number),
                                      np.asarray(cts.max_number))
        np.testing.assert_array_equal(np.asarray(fts.valid),
                                      np.asarray(cts.valid))
        np.testing.assert_array_equal(np.asarray(fts.merge_score),
                                      np.asarray(cts.merge_score))
        np.testing.assert_array_equal(np.asarray(fs.prev_max),
                                      np.asarray(cnew.prev_max))
        np.testing.assert_array_equal(np.asarray(fs.consec_count),
                                      np.asarray(cnew.consec_count))
        np.testing.assert_array_equal(np.asarray(fs.last_consec_penalty),
                                      np.asarray(cnew.last_consec_penalty))
        saw_done |= bool(np.asarray(fts.done).any())
        saw_stall |= bool((np.asarray(fs.consec_count) > 3).any())
        saw_invalid |= bool((~np.asarray(fts.valid)).any())
    assert saw_done and saw_stall and saw_invalid


def test_resolve_engine_picks_fast_for_shaped():
    from tpu2048.env.fast import resolve_engine

    assert resolve_engine(EnvConfig(reward=SHAPED), "auto") == "fast"
    assert resolve_engine(
        EnvConfig(reward=SHAPED, auto_reset=False), "auto"
    ) == "lax"


def test_shaped_tabular_training_chunk_on_fast_engine():
    """The tabular trainer's shaped regime (the 200k-game run-of-record
    config, QLearningBase/Agent/main.py) now runs its actor on the fused
    kernel: a few chunks must learn (states inserted, Q written) with
    sane metrics."""
    from tpu2048.agents.tabular import TabularConfig
    from tpu2048.training import tabular as tabtrain

    config = tabtrain.TabularTrainConfig(
        agent=TabularConfig(capacity_log2=14, total_epochs=400),
        env=EnvConfig(reward=SHAPED),
        batch_size=64,
        total_episodes=64,
        steps_per_chunk=32,
    )
    assert tabtrain.resolve_engine(config) == "fast"
    state = tabtrain.init_train_state(config)
    assert isinstance(state.env_state, ShapedFastEnvState)
    chunk = jax.jit(lambda s: tabtrain.train_chunk(config, s))
    for _ in range(4):
        state, eps = chunk(state)
    assert int(jnp.sum(state.table.occupied)) > 50
    from tpu2048.agents.tabular_fast import PackedQTable, unpack_qtable

    table = state.table
    if isinstance(table, PackedQTable):
        table = unpack_qtable(table)
    assert float(jnp.sum(jnp.abs(table.q))) > 0
    assert int(state.env_steps) == 4 * 32 * 64
    # Shaped rewards are normalized to [-10, 10] per step (plus stall
    # penalties >= -10): returns stay bounded, never NaN.
    assert np.isfinite(float(state.sum_return))


def test_shaped_sharded_kernel_equals_unsharded():
    """shard_map'd shaped kernel over the 8-device CPU mesh == the
    single-device shaped step, bit-for-bit (external bits)."""
    from tpu2048.env.fast import make_sharded_kernel
    from tpu2048.parallel import MeshConfig, create_mesh

    if jax.device_count() < 8:
        import pytest

        pytest.skip("needs the 8-device CPU mesh")
    mesh = create_mesh(MeshConfig(data_parallel=8))
    cfg = shaped_cfg(backend="pallas", block_size=16)
    kern = make_sharded_kernel(cfg, mesh, need_legal=True)
    s0 = fast_reset(cfg, jax.random.PRNGKey(3), B)
    s_ref = s0
    s_sh = s0
    key = jax.random.PRNGKey(11)
    act = jnp.zeros((B,), jnp.int32)
    for _ in range(6):
        key, ka = jax.random.split(key)
        act = sticky_actions(ka, act, B)
        s_ref, t_ref = fast_step(cfg, s_ref, act, need_obs=True,
                                 need_legal=True)
        s_sh, t_sh = fast_step(cfg, s_sh, act, need_obs=True,
                               need_legal=True, sharded_kernel=kern)
        np.testing.assert_array_equal(np.asarray(s_ref.boards),
                                      np.asarray(s_sh.boards))
        np.testing.assert_array_equal(np.asarray(t_ref.reward),
                                      np.asarray(t_sh.reward))
        np.testing.assert_array_equal(np.asarray(s_ref.consec_count),
                                      np.asarray(s_sh.consec_count))
        np.testing.assert_array_equal(np.asarray(s_ref.legal),
                                      np.asarray(s_sh.legal))


def test_shaped_eval_harness_runs_on_fast_engine():
    """eval with a SHAPED env now routes through the fast engine
    (resolve_engine) and produces sane distributions — the harness that
    previously pinned shaped evals at the op-by-op env's throughput."""
    import importlib

    ev = importlib.import_module("tpu2048.eval.evaluate")

    res = ev.evaluate(
        ev.random_legal_policy(), 32, jax.random.PRNGKey(2),
        env_config=EnvConfig(reward=SHAPED, auto_reset=False),
        batch_size=32, max_steps=600,
    )
    assert len(res.scores) == 32
    assert (res.scores > 0).all()
    assert 32 <= res.max_tiles.max() <= 512  # random-play territory


def test_shaped_dqn_loop_sharding_covers_all_lanes():
    """dqn_loop_sharding must produce a NamedSharding for EVERY leaf of a
    shaped-env loop state (the shaped lanes are new; a missed field would
    surface as a raw array in the sharding pytree and break pjit)."""
    import jax.sharding as js

    from tpu2048.agents.dqn import DQNConfig
    from tpu2048.env import SIMPLE
    from tpu2048.parallel import MeshConfig, create_mesh, dqn_loop_sharding
    from tpu2048.training import dqn as dqntrain

    if jax.device_count() < 8:
        import pytest

        pytest.skip("needs the 8-device CPU mesh")
    tiny = DQNConfig(features=16, hidden=32, num_blocks=1, bf16=False,
                     dropout=0.0, memory_size=512)
    cfg = dqntrain.DQNTrainConfig(
        agent=tiny, env=EnvConfig(reward=SHAPED), num_envs=32,
    )
    _, state = dqntrain.init_loop_state(cfg)
    assert isinstance(state.env_state, ShapedFastEnvState)
    mesh = create_mesh(MeshConfig(data_parallel=8))
    sh = dqn_loop_sharding(state, mesh)
    for path, leaf in jax.tree_util.tree_leaves_with_path(sh):
        assert isinstance(leaf, js.NamedSharding), path
