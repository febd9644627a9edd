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


def main(batch: int = 131072, steps: int = 1024, warmup: int = 32) -> None:
    config = FastEnvConfig(terminal_bonus=True)
    state = fast_reset(config, jax.random.PRNGKey(0), batch)

    @functools.partial(jax.jit, static_argnums=1, donate_argnums=0)
    def rollout(state, n):
        def body(st, _):
            st, ts = fast_step(config, st)
            return st, (ts.reward.sum(), ts.done.sum())

        return jax.lax.scan(body, state, None, length=n)

    state, _ = rollout(state, warmup)
    jax.block_until_ready(state.boards)
    t0 = time.perf_counter()
    state, (rewards, dones) = rollout(state, steps)
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
