"""Device mesh, sharding specs, and multi-host runtime glue.

The reference is strictly single-process/single-device (its only hardware
awareness is a GPU visibility print, mainDQL_CNN_step2.py:92-94). This
module is the greenfield distributed tier mandated by SURVEY.md §2b:

* ``data`` axis — the scale-out axis: environments, dedup caches, and
  replay shards are sharded along it; the learner batch is sharded along
  it; XLA inserts the gradient allreduce (``psum``) over ICI/DCN
  automatically under ``jit`` (GSPMD).
* ``model`` axis — optional tensor parallelism for the 96.8M-param CNN:
  conv filters and the Dense(1024) are sharded on their output channel;
  off by default (the model fits one chip comfortably).

Everything is expressed with ``jax.sharding.NamedSharding`` + ``jit`` —
no hand-written collectives; the design follows the standard JAX SPMD
recipe (mesh -> annotate -> let XLA insert collectives).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data_parallel: int = -1  # -1 = all remaining devices
    model_parallel: int = 1


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-controller bring-up (no-op for single-process runs).

    Each host runs the same SPMD program; host 0 owns checkpoint writes and
    logging (see tpu2048.metrics / tpu2048.checkpoint).
    """
    if coordinator_address is None:
        return  # single-process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_primary_host() -> bool:
    return jax.process_index() == 0


def create_mesh(
    config: MeshConfig = MeshConfig(), devices=None
) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    mp = max(config.model_parallel, 1)
    dp = config.data_parallel if config.data_parallel > 0 else n // mp
    if dp * mp > n:
        raise ValueError(
            f"mesh {dp}x{mp} needs {dp * mp} devices, only {n} available"
        )
    if dp * mp != n:
        # Never strand chips silently: an explicit dp*mp < n is honored as
        # an intentional subset but announced loudly.
        import warnings

        warnings.warn(
            f"mesh {dp}x{mp} uses only {dp * mp} of {n} available devices; "
            f"the rest sit idle",
            stacklevel=2,
        )
        devices = devices[: dp * mp]
    grid = np.array(devices).reshape(dp, mp)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 over ``data`` (envs, replay shards, batches)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _batch_spec(leaf) -> P:
    return P(DATA_AXIS) if getattr(leaf, "ndim", 0) >= 1 else P()


def param_partition_spec(params, model_parallel: int) -> dict:
    """Tensor-parallel PartitionSpecs for DQNCNN parameters.

    Rule: shard the output-channel (last) axis of every kernel/bias whose
    size divides ``model_parallel``; the 4-unit head stays replicated. With
    ``model_parallel == 1`` everything is replicated.
    """

    def spec(path, leaf):
        if model_parallel <= 1:
            return P()
        path_str = "/".join(str(getattr(k, "key", k)) for k in path)
        if "head" in path_str:
            return P()
        if leaf.ndim >= 1 and leaf.shape[-1] % model_parallel == 0:
            return P(*([None] * (leaf.ndim - 1) + [MODEL_AXIS]))
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def dqn_loop_sharding(state, mesh: Mesh, model_parallel: int = 1):
    """NamedShardings for a :class:`tpu2048.training.dqn.DQNLoopState`.

    * env state / dedup caches / replay shards: axis 0 on ``data``
    * agent params & optimizer state: replicated (or TP-sharded)
    * scalars / metric accumulators / PRNG keys: replicated
    """
    from tpu2048.training.dqn import DQNLoopState  # noqa: PLC0415

    assert isinstance(state, DQNLoopState)
    ns = lambda spec: NamedSharding(mesh, spec)  # noqa: E731

    def shard_batched(tree):
        return jax.tree.map(lambda x: ns(_batch_spec(x)), tree)

    def shard_env(env_state):
        from tpu2048.env.fast import (  # noqa: PLC0415
            FastEnvState, ShapedFastEnvState,
        )

        if not isinstance(env_state, FastEnvState):
            return shard_batched(env_state)
        # Fast env: boards are cell-major (16, B) — batch is axis 1; the
        # legal mask is (B, 4); lane stats are (B,); the PRNG seed counter
        # is a replicated scalar.
        sh = env_state.replace(
            boards=ns(P(None, DATA_AXIS)),
            legal=ns(P(DATA_AXIS)),
            score=ns(P(DATA_AXIS)),
            episode_steps=ns(P(DATA_AXIS)),
            episode_return=ns(P(DATA_AXIS)),
            seed=ns(P()),
        )
        if isinstance(env_state, ShapedFastEnvState):
            # Shaped mode adds four per-env shaping lanes — batch axis 0.
            sh = sh.replace(
                prev_max=ns(P(DATA_AXIS)),
                consec_action=ns(P(DATA_AXIS)),
                consec_count=ns(P(DATA_AXIS)),
                last_consec_penalty=ns(P(DATA_AXIS)),
            )
        return sh

    param_specs = param_partition_spec(state.agent.params, model_parallel)
    params_sh = jax.tree.map(lambda s: ns(s), param_specs,
                             is_leaf=lambda x: isinstance(x, P))
    target_sh = jax.tree.map(lambda s: ns(s), param_specs,
                             is_leaf=lambda x: isinstance(x, P))

    def opt_sharding(opt_state):
        if model_parallel <= 1:
            return jax.tree.map(lambda x: ns(P()), opt_state)

        # TP: Adam moment tensors shard like their parameters (matched by
        # shape); scalar counts/hyperparams replicate.
        pairs = list(
            zip(
                jax.tree.leaves(state.agent.params),
                jax.tree.leaves(
                    param_specs, is_leaf=lambda s: isinstance(s, P)
                ),
            )
        )

        def moment_spec(x):
            for pleaf, spec in pairs:
                if getattr(x, "shape", None) == pleaf.shape:
                    return ns(spec)
            return ns(P())

        return jax.tree.map(moment_spec, opt_state)

    agent_sh = state.agent.replace(
        params=params_sh,
        target_params=target_sh,
        opt_state=opt_sharding(state.agent.opt_state),
        step_counter=ns(P()),
        train_steps=ns(P()),
        rng=ns(P()),
    )
    # Default: replicate every leaf (covers scalar counters and metric
    # accumulators, including ones added later); then override the batched
    # and parameter parts.
    base = jax.tree.map(lambda x: ns(P()), state)
    return base.replace(
        env_state=shard_env(state.env_state),
        dedup=shard_batched(state.dedup),
        buffer=shard_batched(state.buffer),
        agent=agent_sh,
    )


def place_loop_state(state, shardings):
    """Device-put a loop state onto its shardings."""
    return jax.tree.map(jax.device_put, state, shardings)
