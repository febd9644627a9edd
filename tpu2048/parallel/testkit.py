"""Distributed test rig: run the real DQN train chunk on any device set.

The reference has no distributed anything and no tests (SURVEY.md §4);
this is the "fake backend" tier we owe instead — one helper that drives
the full sharded training step identically under (a) a single-process
virtual mesh and (b) a real multi-process `jax.distributed` runtime, and
returns a process-topology-independent digest for equality assertions.

Multi-process-safe by construction: the loop state is materialized
INSIDE jit via ``out_shardings`` (skipping a host round-trip; plain
``place_loop_state``/``device_put`` also works under multi-controller —
the production train() path uses it), and digest scalars are read from
fully-replicated outputs through ``addressable_data(0)``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np

# A tiny but complete config: full train path (env scan, replay insert,
# dedup, learner updates, target net) at toy sizes.
CONFIG_KW: Dict[str, Any] = dict(
    features=16, hidden=32, num_blocks=1, envs_per_dp=8, batch_per_dp=8,
    steps_per_chunk=2, memory_per_dp=64, seed=0,
)


def run_chunks(
    n_devices: int,
    model_parallel: int,
    chunks: int,
    *,
    features: int,
    hidden: int,
    num_blocks: int,
    envs_per_dp: int,
    batch_per_dp: int,
    steps_per_chunk: int,
    memory_per_dp: int,
    seed: int,
) -> Dict[str, float]:
    from tpu2048.agents.dqn import DQNConfig, make_optimizer
    from tpu2048.env import EnvConfig, SIMPLE
    from tpu2048.env.fast import make_sharded_kernel
    from tpu2048.parallel import MeshConfig, create_mesh, dqn_loop_sharding
    from tpu2048.training.dqn import (
        DQNTrainConfig,
        fast_config,
        init_loop_state,
        resolve_engine,
        train_chunk,
    )

    devices = jax.devices()[:n_devices]
    assert len(devices) == n_devices, (
        f"need {n_devices} global devices, have {len(jax.devices())}"
    )
    dp = n_devices // model_parallel
    mesh = create_mesh(
        MeshConfig(data_parallel=dp, model_parallel=model_parallel),
        devices=devices,
    )

    config = DQNTrainConfig(
        agent=DQNConfig(
            features=features, hidden=hidden, num_blocks=num_blocks,
            bf16=False, dropout=0.0, memory_size=memory_per_dp * dp,
            epsilon=0.5,
        ),
        env=EnvConfig(reward=SIMPLE, terminal_bonus=True),
        num_envs=envs_per_dp * dp,
        updates_per_step=1,
        train_batch=batch_per_dp * dp,
        steps_per_chunk=steps_per_chunk,
        replay_shards=dp,
        seed=seed,
    )
    tx = make_optimizer(config.agent)
    model, template = init_loop_state(config)
    shardings = dqn_loop_sharding(template, mesh, model_parallel)
    # Materialize the state directly into its shardings on-device; no
    # host-side global array construction (works under multi-controller).
    state = jax.jit(
        lambda: init_loop_state(config)[1], out_shardings=shardings
    )()
    # Pin output shardings too: chunk N+1 consumes chunk N's output, so
    # letting the compiler choose would make the second call's args
    # disagree with in_shardings.
    sk = None
    if resolve_engine(config) == "fast":
        sk = make_sharded_kernel(fast_config(config), mesh, need_legal=True)
    step = jax.jit(
        lambda s: train_chunk(config, model, tx, s, sharded_kernel=sk),
        in_shardings=(shardings,),
        out_shardings=(shardings, None, None),
    )
    eps = None
    for _ in range(chunks):
        state, eps, _ = step(state)
    jax.block_until_ready(state.agent.params)

    def scalar(x) -> float:
        arr = np.asarray(x.addressable_data(0))
        return float(arr.reshape(-1)[0]) if arr.ndim else float(arr)

    param_sum = jax.jit(
        lambda s: sum(
            jax.numpy.sum(jax.numpy.abs(p)).astype(jax.numpy.float32)
            for p in jax.tree.leaves(s.agent.params)
        ),
        out_shardings=jax.NamedSharding(mesh, jax.sharding.PartitionSpec()),
    )(state)

    return {
        "env_steps": int(scalar(state.env_steps)),
        "episodes": int(scalar(state.episodes_done)),
        "eps": float(scalar(eps)),
        "param_sum": float(scalar(param_sum)),
        "loss_sum": float(scalar(state.loss_sum)),
    }
