"""Headline benchmark: batched 2048 env throughput on one chip.

Prints ONE JSON line: env-steps/s for the full production step — the fused
Pallas kernel (tpu2048/ops/pallas_step.py) doing merge/legality/in-kernel
random-legal policy/spawn/game-over/auto-reset plus reward and episode
accounting, under ``jit`` + ``lax.scan``. The headline path runs the
multi-step rollout variant (``fused_env_rollout``: ``--rollout-k`` env
steps per kernel launch, boards + episode accounting resident in VMEM
across the window — tuned best at k=16, block 512); ``--rollout-k 1``
measures the single-step kernel (``fast_step``) instead.

``vs_baseline``: the north-star target is 50M env-steps/s on a v5e-8
(BASELINE.json:5), i.e. 6.25M env-steps/s/chip; ``vs_baseline`` is the
measured per-chip rate over that per-chip target (1.0 = on target).

Secondary modes (each prints its own JSON line):

* ``--learner``      DQN learner updates/s on the full 96.8M-param CNN.
* ``--train-loop``   actor-side env-steps/s of the REAL DQN training chunk
                     (fast engine + full-size CNN policy + dedup + replay
                     insert; learner updates off) — the throughput of the
                     hot loop the reference spends its life in
                     (mainDQL_CNN_step2.py:160-237).
* ``--tabular``      env-steps/s of the tabular training chunk (shaped
                     fast engine + bucketed hashed Q-table).
* ``--scale N[,M..]``  DP scaling: the full DQN train chunk on an N-device
                     mesh; one JSON line per N with steps/s/device and
                     efficiency vs N=1 (the >=85% BASELINE.md target). On
                     this one-chip machine run it on the CPU-sim mesh:
                     ``XLA_FLAGS=--xla_force_host_platform_device_count=8
                     JAX_PLATFORMS=cpu python bench.py --scale 1,2,4,8``
                     (plumbing correctness now; real slice later).
"""

import functools
import json
import time

import jax
import jax.numpy as jnp

from tpu2048.env.fast import (
    FastEnvConfig,
    fast_reset,
    fast_rollout,
    fast_step,
)

PER_CHIP_TARGET = 50e6 / 8  # BASELINE.json north star, per chip


def main(batch: int = 131072, steps: int = 2048, warmup: int = 32,
         rollout_k: int = 16) -> None:
    import numpy as np

    config = FastEnvConfig(
        terminal_bonus=True, block_size=512 if rollout_k > 1 else 1024
    )
    state = fast_reset(config, jax.random.PRNGKey(0), batch)
    if steps % rollout_k:
        raise ValueError(f"steps {steps} not divisible by k {rollout_k}")

    @functools.partial(jax.jit, static_argnums=1)
    def rollout(state, n):
        def body(st, _):
            if rollout_k > 1:
                st, r, d = fast_rollout(config, st, rollout_k)
                return st, (r.sum(), d.sum())
            st, ts = fast_step(config, st)
            return st, (ts.reward.sum(), ts.done.sum())

        st, (r, d) = jax.lax.scan(body, state, None, length=n // rollout_k)
        # Reduce to scalars inside jit so the host fence transfers 8 bytes.
        # f32 accumulation: the int32 total can exceed 2**31 at the
        # headline config (131072 envs x 2048 steps x ~10 reward/step);
        # this value is a host fence, but keep it non-wrapping anyway.
        return st, (r.astype(jnp.float32).sum(), d.sum())

    # Methodology notes (this machine routes the TPU through a remote
    # tunnel): warm up with the SAME static length so the timed call reuses
    # the compiled executable (a different n recompiles inside the timing),
    # and fence with an actual host transfer — block_until_ready alone has
    # been observed returning early on the tunneled backend.
    state, (r, _) = rollout(state, steps)
    float(np.asarray(r))
    t0 = time.perf_counter()
    state, (r, dones) = rollout(state, steps)
    float(np.asarray(r))
    dt = time.perf_counter() - t0

    rate = batch * steps / dt
    print(
        json.dumps(
            {
                "metric": "env_steps_per_s_per_chip",
                "value": round(rate),
                "unit": "steps/s",
                "vs_baseline": round(rate / PER_CHIP_TARGET, 3),
            }
        )
    )


def learner_main(
    batch: int = 64, updates: int = 200, warmup: int = 10
) -> None:
    """Secondary benchmark: full-size DQN learner updates/s on one chip.

    Measures the jit'd ``train_step`` (sample → double-forward → MSE grad →
    Adam apply → priority write) on the reference-topology 96.8M-param CNN
    (Dqn8TestNOPERCNN.py:202-249: batch 64, Adam 5e-5) in bf16. The
    reference's learner runs 100 updates per ~165-step episode on one GPU;
    it publishes no rate (SURVEY.md §6), so ``vs_baseline`` is vs a
    1-update/s nominal floor (a TF2.10 GradientTape step on this model is
    O(1s) on a host GPU).
    """
    from tpu2048.agents import dqn as dqnlib
    from tpu2048.replay import buffer as replaylib

    acfg = dqnlib.DQNConfig(memory_size=4096)
    model, agent = dqnlib.create_train_state(acfg, jax.random.PRNGKey(0))
    tx = dqnlib.make_optimizer(acfg)

    # Fill a small replay buffer with random transitions.
    k = jax.random.PRNGKey(1)
    buf = replaylib.replay_init(acfg.memory_size)
    n_fill = 1024
    ks, ka, kr, kn = jax.random.split(k, 4)
    boards = jax.random.randint(ks, (n_fill, 4, 4), 0, 12, jnp.int32).astype(
        jnp.int8
    )
    nxt = jax.random.randint(kn, (n_fill, 4, 4), 0, 12, jnp.int32).astype(
        jnp.int8
    )
    actions = jax.random.randint(ka, (n_fill,), 0, 4, jnp.int32)
    rewards = jax.random.uniform(kr, (n_fill,), jnp.float32)
    dones = jnp.zeros((n_fill,), bool)
    buf = jax.jit(replaylib.replay_add)(
        buf, boards, actions, rewards, dones, nxt, jnp.ones((n_fill,), bool)
    )

    @functools.partial(jax.jit, static_argnums=1, donate_argnums=0)
    def run(carry, n):
        agent, rng = carry

        def body(c, _):
            agent, rng = c
            rng, ks = jax.random.split(rng)
            batch_t, _, _ = replaylib.replay_sample(
                buf, ks, batch, acfg.alpha, acfg.beta
            )
            agent, metrics = dqnlib.train_step(acfg, model, tx, agent, batch_t)
            return (agent, rng), metrics["loss"]

        return jax.lax.scan(body, carry, None, length=n)

    import numpy as np

    del warmup  # warm-up must use the same static length (no recompile)
    carry = (agent, jax.random.PRNGKey(2))
    carry, losses = run(carry, updates)
    float(np.asarray(losses[-1]))  # host fence (see main())
    t0 = time.perf_counter()
    carry, losses = run(carry, updates)
    float(np.asarray(losses[-1]))
    dt = time.perf_counter() - t0

    rate = updates / dt
    print(
        json.dumps(
            {
                "metric": "dqn_updates_per_s_per_chip",
                "value": round(rate, 2),
                "unit": "updates/s",
                "vs_baseline": round(rate / 1.0, 2),
            }
        )
    )


def _fence(x) -> float:
    """Host-transfer fence (block_until_ready returns early on the tunnel)."""
    import numpy as np

    return float(np.asarray(x).reshape(-1)[0])


def _train_loop_config(envs: int, full_model: bool = True):
    from tpu2048.agents import dqn as dqnlib
    from tpu2048.env import EnvConfig, SIMPLE
    from tpu2048.training.dqn import DQNTrainConfig

    agent = dqnlib.DQNConfig() if full_model else dqnlib.DQNConfig(
        features=32, hidden=32, num_blocks=1, bf16=False, dropout=0.0
    )
    return DQNTrainConfig(
        agent=agent,
        env=EnvConfig(reward=SIMPLE, terminal_bonus=True),
        num_envs=envs,
        updates_per_step=0,  # actor side only
        steps_per_chunk=64,
    )


def train_loop_main(envs: int = 128, chunks: int = 8) -> None:
    """Actor-side env-steps/s of the real DQN training chunk.

    The full production actor: kernel-emitted legal mask -> full-size CNN
    epsilon-greedy (bf16) -> fused Pallas env step -> dedup -> replay
    insert. ``vs_baseline`` is vs the same 6.25M/chip north star as the
    raw env bench — the CNN forward dominates, so this is the honest
    "how fast is the loop that trains" number.
    """
    from tpu2048.agents.dqn import make_optimizer
    from tpu2048.training.dqn import init_loop_state, train_chunk

    config = _train_loop_config(envs)
    tx = make_optimizer(config.agent)
    model, state = init_loop_state(config)
    chunk = jax.jit(
        lambda s: train_chunk(config, model, tx, s), donate_argnums=0
    )
    state, _, _ = chunk(state)  # compile + warm
    _fence(state.env_steps)
    t0 = time.perf_counter()
    for _ in range(chunks):
        state, _, _ = chunk(state)
    _fence(state.env_steps)
    dt = time.perf_counter() - t0
    rate = envs * config.steps_per_chunk * chunks / dt
    print(
        json.dumps(
            {
                "metric": "train_loop_env_steps_per_s_per_chip",
                "value": round(rate),
                "unit": "steps/s",
                "vs_baseline": round(rate / PER_CHIP_TARGET, 3),
            }
        )
    )


def tabular_main(batch: int = 4096, chunks: int = 4,
                 table_backend: str = "auto") -> None:
    """Tabular training env-steps/s: shaped FAST engine (fused Pallas
    kernel, shaped mode) + hashed Q-table — the QLearningBase regime
    end-to-end. ``table_backend``: "pallas" (packed explicit-DMA kernels,
    ops/table_kernel.py — TPU default), "xla" (their jnp twin), "legacy"
    (the r4 two-array table, for the A/B)."""
    from tpu2048.agents.tabular import TabularConfig
    from tpu2048.training.tabular import (
        TabularTrainConfig,
        init_train_state,
        resolve_table_backend,
        train_chunk,
    )

    config = TabularTrainConfig(
        agent=TabularConfig(capacity_log2=24, total_epochs=100),
        batch_size=batch,
        steps_per_chunk=256,
        table_backend=table_backend,
    )
    state = init_train_state(config)
    chunk = jax.jit(
        lambda s: train_chunk(config, s), donate_argnums=0
    )
    state, _ = chunk(state)
    _fence(state.env_steps)
    t0 = time.perf_counter()
    for _ in range(chunks):
        state, _ = chunk(state)
    _fence(state.env_steps)
    dt = time.perf_counter() - t0
    rate = batch * config.steps_per_chunk * chunks / dt
    print(
        json.dumps(
            {
                "metric": "tabular_env_steps_per_s_per_chip",
                "value": round(rate),
                "unit": "steps/s",
                "batch": batch,
                "table_backend": resolve_table_backend(config),
                "vs_baseline": round(rate / PER_CHIP_TARGET, 3),
            }
        )
    )


def scale_main(device_counts, envs_per_dev: int = 256,
               chunks: int = 4) -> None:
    """DP scaling of the full DQN train chunk over an N-device mesh.

    One JSON line per N: env-steps/s/device + efficiency vs the N=1 rate.
    Measures the whole production step (sharded fused-kernel actor, tiny
    CNN so CPU-sim runs finish, sharded replay, psum'd learner update).
    The >=85% BASELINE.md scaling target reads off ``efficiency``.
    """
    import os

    # Honor a CPU-sim request BEFORE any backend initializes: this
    # machine's sitecustomize force-sets jax_platforms="axon,cpu", so the
    # JAX_PLATFORMS env var alone is not enough (same rule as
    # __graft_entry__.dryrun_multichip).
    if (
        "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", "")
        or os.environ.get("JAX_PLATFORMS", "") == "cpu"
    ):
        jax.config.update("jax_platforms", "cpu")

    from tpu2048.agents.dqn import make_optimizer
    from tpu2048.env.fast import make_sharded_kernel
    from tpu2048.parallel import (
        MeshConfig,
        create_mesh,
        dqn_loop_sharding,
        place_loop_state,
    )
    from tpu2048.training.dqn import (
        fast_config,
        init_loop_state,
        train_chunk,
    )

    import dataclasses

    base_rate = None
    for n in device_counts:
        config = dataclasses.replace(
            _train_loop_config(envs_per_dev * n, full_model=False),
            updates_per_step=1,
            train_batch=32 * n,
            replay_shards=n,
            steps_per_chunk=32,
        )
        config = dataclasses.replace(
            config,
            agent=dataclasses.replace(config.agent, memory_size=4096 * n),
        )
        mesh = create_mesh(
            MeshConfig(data_parallel=n), devices=jax.devices()[:n]
        )
        tx = make_optimizer(config.agent)
        model, state = init_loop_state(config)
        shardings = dqn_loop_sharding(state, mesh, 1)
        state = place_loop_state(state, shardings)
        sk = make_sharded_kernel(fast_config(config), mesh, need_legal=True)
        chunk = jax.jit(
            lambda s, c=config, m=model, t=tx, k=sk: train_chunk(
                c, m, t, s, sharded_kernel=k
            ),
            donate_argnums=0,
            in_shardings=(shardings,),
            out_shardings=(shardings, None, None),
        )
        state, _, _ = chunk(state)
        _fence(state.env_steps)
        t0 = time.perf_counter()
        for _ in range(chunks):
            state, _, _ = chunk(state)
        _fence(state.env_steps)
        dt = time.perf_counter() - t0
        rate = config.num_envs * config.steps_per_chunk * chunks / dt
        per_dev = rate / n
        if base_rate is None:
            base_rate = per_dev
        row = {
            "metric": "dp_scaling_env_steps_per_s_per_device",
            "devices": n,
            "value": round(per_dev),
            "unit": "steps/s/device",
            "efficiency": round(per_dev / base_rate, 3),
            "vs_baseline": round((per_dev / base_rate) / 0.85, 3),
        }
        if jax.devices()[0].platform == "cpu":
            # Forced-CPU virtual mesh (likely core-oversubscribed):
            # "efficiency" here validates the SPMD program, not hardware
            # scaling — mark the row so raw output can't be misread as a
            # sharding defect or a hardware result (PARITY.md).
            row["simulated"] = True
        print(json.dumps(row))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__, allow_abbrev=False)
    ap.add_argument("--learner", action="store_true")
    ap.add_argument("--train-loop", action="store_true")
    ap.add_argument("--tabular", action="store_true")
    ap.add_argument("--scale", type=str, default=None,
                    help="comma-separated device counts, e.g. 1,2,4,8")
    ap.add_argument("--batch", type=int, default=None,
                    help="env batch (headline) / envs (tabular)")
    ap.add_argument("--steps", type=int, default=2048)
    ap.add_argument("--envs", type=int, default=128,
                    help="env count for --train-loop")
    ap.add_argument("--train-batch", type=int, default=64,
                    help="learner batch for --learner")
    ap.add_argument("--updates", type=int, default=200)
    ap.add_argument("--rollout-k", type=int, default=16,
                    help="env steps per kernel launch for the headline "
                         "bench (1 = single-step fast_step path)")
    ap.add_argument("--table-backend", type=str, default="auto",
                    choices=["auto", "pallas", "interpret", "xla", "legacy"],
                    help="--tabular Q-table backend (pallas = packed "
                         "explicit-DMA kernels; legacy = r4 table, for A/B)")
    a = ap.parse_args()

    if a.learner:
        learner_main(batch=a.train_batch, updates=a.updates)
    elif a.train_loop:
        train_loop_main(envs=a.envs)
    elif a.tabular:
        tabular_main(batch=a.batch or 4096, table_backend=a.table_backend)
    elif a.scale:
        scale_main([int(x) for x in a.scale.split(",")])
    else:
        main(batch=a.batch or 131072, steps=a.steps, rollout_k=a.rollout_k)
