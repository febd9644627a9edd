"""Decompose the tabular training step: table ops vs env step, on TPU.

Times (ms/step) at a given batch: (a) Q-table ops only (probe+lookup+
targets+update on random boards), (b) shaped FAST env step only,
(c) shaped LAX env step only, (d) full train_chunk per engine.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, carry, n, reps=3):
    carry, y = fn(carry, n)
    jax.block_until_ready(carry)
    float(np.asarray(y))  # host fence
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        carry, y = fn(carry, n)
        float(np.asarray(y))
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def main(batch=1024, steps=256):
    from tpu2048.agents import tabular as tab
    from tpu2048.env import EnvConfig, SHAPED
    from tpu2048.env import env as envlib
    from tpu2048.env import fast as fastlib

    # (a) table ops only, random boards regenerated cheaply per step
    table = tab.qtable_init(25)
    k = jax.random.PRNGKey(0)
    boards = jax.random.randint(k, (batch, 4, 4), 0, 12, jnp.int32).astype(jnp.int8)

    @functools.partial(jax.jit, static_argnums=1, donate_argnums=0)
    def table_only(carry, n):
        table, rng = carry

        def body(c, _):
            table, rng = c
            rng, ka = jax.random.split(rng)
            # perturb boards so states vary step to step
            delta = jax.random.randint(ka, (batch, 1, 1), 0, 3).astype(jnp.int8)
            b = jnp.clip(boards + delta, 0, 14)
            nb = jnp.clip(b + 1, 0, 14)
            actions, probe = tab.choose_actions_probed(table, b, 0.1, ka)
            targets = tab.q_learning_targets(
                table, jnp.ones((batch,)), nb, jnp.zeros((batch,), bool), 0.9
            )
            table = tab.qtable_update(table, b, actions, targets, 0.1,
                                      probe=probe)
            return (table, rng), actions[0]

        (table, rng), ys = jax.lax.scan(body, carry, None, length=n)
        return (table, rng), ys[-1]

    print(f"table_only(B={batch}): "
          f"{timeit(table_only, (table, jax.random.PRNGKey(1)), steps):.3f} ms",
          flush=True)

    # (b) shaped fast env only
    fcfg = fastlib.for_backend(batch_size=batch,
                               env_config=EnvConfig(reward=SHAPED))

    @functools.partial(jax.jit, static_argnums=1, donate_argnums=0)
    def fast_env_only(carry, n):
        def body(st, _):
            acts = (st.episode_steps % 4).astype(jnp.int32)
            st, ts = fastlib.fast_step(fcfg, st, acts, need_obs=True)
            return st, ts.reward[0]

        st, ys = jax.lax.scan(body, carry, None, length=n)
        return st, ys[-1]

    st = fastlib.fast_reset(fcfg, jax.random.PRNGKey(2), batch)
    print(f"fast_shaped_env_only(B={batch}): "
          f"{timeit(fast_env_only, st, steps):.3f} ms", flush=True)

    # (c) shaped lax env only
    ecfg = EnvConfig(reward=SHAPED)

    @functools.partial(jax.jit, static_argnums=1, donate_argnums=0)
    def lax_env_only(carry, n):
        def body(st, _):
            acts = (st.episode_steps % 4).astype(jnp.int32)
            st, ts = envlib.step(ecfg, st, acts)
            return st, ts.reward[0]

        st, ys = jax.lax.scan(body, carry, None, length=n)
        return st, ys[-1]

    est = envlib.reset(ecfg, jax.random.PRNGKey(3), batch)
    print(f"lax_shaped_env_only(B={batch}): "
          f"{timeit(lax_env_only, est, steps):.3f} ms", flush=True)

    # (d) full chunk per engine
    from tpu2048.agents.tabular import TabularConfig
    from tpu2048.training import tabular as tabtrain

    for engine in ("fast", "lax"):
        cfg = tabtrain.TabularTrainConfig(
            agent=TabularConfig(capacity_log2=25, total_epochs=100),
            env=EnvConfig(reward=SHAPED),
            batch_size=batch, steps_per_chunk=steps, engine=engine,
        )
        state = tabtrain.init_train_state(cfg)

        @functools.partial(jax.jit, static_argnums=1, donate_argnums=0)
        def chunk_n(carry, n, cfg=cfg):
            def body(st, _):
                st, eps = tabtrain.train_chunk(
                    tabtrain.TabularTrainConfig(
                        agent=cfg.agent, env=cfg.env,
                        batch_size=cfg.batch_size, steps_per_chunk=1,
                        engine=cfg.engine),
                    st)
                return st, eps

            st, ys = jax.lax.scan(body, carry, None, length=n)
            return st, ys[-1]

        print(f"full_chunk(engine={engine}, B={batch}): "
              f"{timeit(chunk_n, state, steps):.3f} ms", flush=True)


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    main(batch=b)
