"""Headline benchmark: batched 2048 env throughput on one chip.

Prints ONE JSON line: env-steps/s for the full production step (legal-move
masking, random-legal policy, slide/merge/spawn/reward/done, auto-reset)
under ``jit`` + ``lax.scan``.

``vs_baseline``: the north-star target is 50M env-steps/s on a v5e-8
(BASELINE.json:5), i.e. 6.25M env-steps/s/chip; ``vs_baseline`` is the
measured per-chip rate over that per-chip target (1.0 = on target).
"""

import json
import time

import jax
import jax.numpy as jnp

from tpu2048.env import EnvConfig, SIMPLE
from tpu2048.env import env as envlib

PER_CHIP_TARGET = 50e6 / 8  # BASELINE.json north star, per chip


def main(batch: int = 65536, steps: int = 256, warmup: int = 16) -> None:
    config = EnvConfig(reward=SIMPLE, terminal_bonus=True, auto_reset=True)
    state = envlib.reset(config, jax.random.PRNGKey(0), batch)

    def rollout(state, key, n):
        def body(st, k):
            action = jax.random.randint(k, (batch,), 0, 4)
            st, ts = envlib.step(config, st, action)
            return st, ts.reward.sum()

        keys = jax.random.split(key, n)
        return jax.lax.scan(body, state, keys)

    run = jax.jit(rollout, static_argnums=2, donate_argnums=0)
    state, _ = run(state, jax.random.PRNGKey(1), warmup)
    jax.block_until_ready(state.board)
    t0 = time.perf_counter()
    state, rewards = run(state, jax.random.PRNGKey(2), steps)
    jax.block_until_ready(rewards)
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


if __name__ == "__main__":
    main()
