"""Headline benchmark: batched 2048 env throughput on one chip.

Prints ONE JSON line: env-steps/s for the full production step — the fused
Pallas kernel (tpu2048/ops/pallas_step.py) doing merge/legality/in-kernel
random-legal policy/spawn/game-over/auto-reset, plus the reward lane ops,
under ``jit`` + ``lax.scan``.

``vs_baseline``: the north-star target is 50M env-steps/s on a v5e-8
(BASELINE.json:5), i.e. 6.25M env-steps/s/chip; ``vs_baseline`` is the
measured per-chip rate over that per-chip target (1.0 = on target).
"""

import functools
import json
import time

import jax
import jax.numpy as jnp

from tpu2048.env.fast import FastEnvConfig, fast_reset, fast_step

PER_CHIP_TARGET = 50e6 / 8  # BASELINE.json north star, per chip


def main(batch: int = 131072, steps: int = 2048, warmup: int = 32) -> None:
    import numpy as np

    config = FastEnvConfig(terminal_bonus=True)
    state = fast_reset(config, jax.random.PRNGKey(0), batch)

    @functools.partial(jax.jit, static_argnums=1)
    def rollout(state, n):
        def body(st, _):
            st, ts = fast_step(config, st)
            return st, (ts.reward.sum(), ts.done.sum())

        st, (r, d) = jax.lax.scan(body, state, None, length=n)
        # Reduce to scalars inside jit so the host fence transfers 8 bytes.
        return st, (r.sum(), d.sum())

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


if __name__ == "__main__":
    import sys

    if "--learner" in sys.argv:
        learner_main()
    else:
        main()
