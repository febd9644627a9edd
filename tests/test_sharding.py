"""Distributed tests on the simulated 8-device CPU mesh (SURVEY.md §4 item 3).

Asserts that data-parallel (and tensor-parallel) sharded execution matches
single-device execution — the TPU-native analogue of fake-backend tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu2048.agents.dqn import DQNConfig, make_optimizer
from tpu2048.env import EnvConfig, SIMPLE
from tpu2048.env import env as envlib
from tpu2048.parallel import (
    MeshConfig,
    create_mesh,
    data_sharding,
    dqn_loop_sharding,
    param_partition_spec,
    place_loop_state,
)
from tpu2048.env.fast import make_sharded_kernel
from tpu2048.training.dqn import (
    DQNTrainConfig,
    fast_config,
    init_loop_state,
    train_chunk,
)

TINY = DQNConfig(
    features=16,
    hidden=32,
    num_blocks=1,
    bf16=False,
    dropout=0.0,
    memory_size=4096,
    epsilon=0.5,  # exercise both explore and exploit lanes
)


def tiny_config(shards):
    return DQNTrainConfig(
        agent=TINY,
        env=EnvConfig(reward=SIMPLE, terminal_bonus=True),
        num_envs=64,
        updates_per_step=2,
        train_batch=32,
        steps_per_chunk=8,
        replay_shards=shards,
        seed=3,
    )


def test_mesh_shapes():
    mesh = create_mesh(MeshConfig(data_parallel=8))
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = create_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    assert mesh2.shape == {"data": 4, "model": 2}


def test_env_rollout_sharded_equals_unsharded():
    """Integer env dynamics + per-env PRNG: sharded == unsharded exactly."""
    config = EnvConfig(reward=SIMPLE)
    B, T = 64, 32
    state = envlib.reset(config, jax.random.PRNGKey(0), B)

    def rollout(state, keys):
        def body(st, k):
            action = jax.random.randint(k, (B,), 0, 4)
            st, ts = envlib.step(config, st, action)
            return st, (ts.obs, ts.reward, ts.done)

        return jax.lax.scan(body, state, keys)

    keys = jax.random.split(jax.random.PRNGKey(1), T)
    _, (obs_ref, rew_ref, done_ref) = jax.jit(rollout)(state, keys)

    mesh = create_mesh(MeshConfig(data_parallel=8))
    sh = data_sharding(mesh)
    state_sh = jax.tree.map(
        lambda x: jax.device_put(x, sh) if x.ndim >= 1 and x.shape[0] == B else x,
        state,
    )
    _, (obs_s, rew_s, done_s) = jax.jit(rollout)(state_sh, keys)
    np.testing.assert_array_equal(np.asarray(obs_ref), np.asarray(obs_s))
    np.testing.assert_array_equal(np.asarray(rew_ref), np.asarray(rew_s))
    np.testing.assert_array_equal(np.asarray(done_ref), np.asarray(done_s))


@pytest.mark.parametrize("model_parallel", [1, 2])
def test_dqn_train_chunk_sharded_equals_unsharded(model_parallel):
    """Full actor-learner chunk: 8-way sharded == single-device.

    With dropout off and f32 math the only nondeterminism is reduction
    order, so params match to ~1e-5.
    """
    config = tiny_config(shards=8)
    tx = make_optimizer(config.agent)
    model, state0 = init_loop_state(config)

    # Reference: same config (8 replay shards) on one device.
    ref_state, _, _ = jax.jit(lambda s: train_chunk(config, model, tx, s))(state0)

    dp = 8 // model_parallel
    mesh = create_mesh(MeshConfig(data_parallel=dp, model_parallel=model_parallel))
    _, fresh = init_loop_state(config)
    shardings = dqn_loop_sharding(fresh, mesh, model_parallel)
    placed = place_loop_state(fresh, shardings)
    # The production sharded actor: the fused step kernel shard_map'd over
    # the data axis (same external bit streams -> same trajectories).
    sk = make_sharded_kernel(fast_config(config), mesh, need_legal=True)
    sh_state, _, _ = jax.jit(
        lambda s: train_chunk(config, model, tx, s, sharded_kernel=sk),
        in_shardings=(shardings,),
        out_shardings=None,
    )(placed)

    # Trajectories identical (integer dynamics, same external bits).
    np.testing.assert_array_equal(
        np.asarray(ref_state.env_state.boards),
        np.asarray(sh_state.env_state.boards),
    )
    assert int(ref_state.episodes_done) == int(sh_state.episodes_done)
    np.testing.assert_array_equal(
        np.asarray(ref_state.buffer.size), np.asarray(sh_state.buffer.size)
    )
    # Learner: parameters agree within reduction-order tolerance.
    ref_p = jax.tree.leaves(ref_state.agent.params)
    sh_p = jax.tree.leaves(sh_state.agent.params)
    for a, b in zip(ref_p, sh_p):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
    assert int(ref_state.agent.train_steps) == int(sh_state.agent.train_steps)
    np.testing.assert_allclose(
        float(ref_state.loss_sum), float(sh_state.loss_sum), rtol=1e-3
    )


def test_param_partition_spec_tp():
    from jax.sharding import PartitionSpec as P

    config = tiny_config(1)
    model, state = init_loop_state(config)
    specs = param_partition_spec(state.agent.params, 2)
    flat = jax.tree_util.tree_flatten_with_path(
        specs, is_leaf=lambda x: isinstance(x, P)
    )[0]
    sharded = {
        "/".join(str(getattr(k, "key", k)) for k in path): spec
        for path, spec in flat
    }
    # Conv kernels and dense shard their last axis; head replicates.
    assert any(
        spec == P(None, None, None, "model")
        for name, spec in sharded.items()
        if "conv" in name and "kernel" in name
    )
    assert all(
        spec == P() for name, spec in sharded.items() if "head" in name
    )


def test_train_loop_with_mesh_end_to_end(tmp_path):
    """The host `train()` loop itself accepts a mesh: state is placed on
    (data=4, model=2), every jit pins in/out shardings, checkpoints
    restore into the sharded template, and training advances."""
    from tpu2048.checkpoint import CheckpointManager
    from tpu2048.training.dqn import train

    mesh = create_mesh(
        MeshConfig(data_parallel=4, model_parallel=2),
        devices=jax.devices()[:8],
    )
    config = tiny_config(shards=4)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    logs = train(
        dataclasses_replace_episodes(config),
        total_episodes=10,
        ckpt_manager=mgr,
        mesh=mesh,
        model_parallel=2,
    )
    assert logs and logs[-1]["episodes"] >= 10
    mgr.wait()
    assert mgr.latest_step() is not None

    # Sharded resume: restore into the sharded template and continue.
    logs2 = train(
        dataclasses_replace_episodes(config),
        total_episodes=logs[-1]["episodes"] + 5,
        ckpt_manager=mgr,
        resume=True,
        mesh=mesh,
        model_parallel=2,
    )
    assert logs2[-1]["episodes"] > logs[-1]["episodes"]
    assert logs2[-1]["env_steps"] > logs[-1]["env_steps"]
    mgr.close()


def dataclasses_replace_episodes(config):
    import dataclasses as _dc

    # frequent periodic ops so the sharded sync/prune/checkpoint jits run
    return _dc.replace(
        config, target_sync_episodes=4, prune_episodes=6,
        checkpoint_episodes=8,
    )


def test_bench_scale_marks_simulated_rows(capsys):
    """bench.py --scale on the forced-CPU virtual mesh must stamp
    "simulated": true on every row so its efficiency numbers cannot be
    misread as hardware scaling results (VERDICT r4 #6)."""
    import json as _json
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))
    from bench import scale_main

    scale_main([1], envs_per_dev=16, chunks=1)
    rows = [
        _json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
        if line.startswith("{")
    ]
    assert rows, "scale_main printed no JSON rows"
    assert all(r.get("simulated") is True for r in rows)
