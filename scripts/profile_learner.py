"""Decompose the DQN learner update (bench.py --learner) into its parts.

Times, on the real chip: (a) the full train_step (baseline), (b) fwd+bwd
only (no optimizer apply), (c) Adam apply only (precomputed grads),
(d) replay sample only, (e) the per-apply fused-conv variant, to show
where the 143.85 updates/s budget goes. Writes docs/learner_profile.json.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpu2048.agents import dqn as dqnlib
from tpu2048.replay import buffer as replaylib


def timeit(fn, carry, n, reps=3):
    carry, _ = fn(carry, n)  # compile + warm
    jax.block_until_ready(carry)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        carry, _ = fn(carry, n)
        jax.block_until_ready(carry)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3  # ms per iteration


def make_buffer(acfg):
    k = jax.random.PRNGKey(1)
    buf = replaylib.replay_init(acfg.memory_size)
    n_fill = 1024
    ks, ka, kr, kn = jax.random.split(k, 4)
    boards = jax.random.randint(ks, (n_fill, 4, 4), 0, 12, jnp.int32).astype(jnp.int8)
    nxt = jax.random.randint(kn, (n_fill, 4, 4), 0, 12, jnp.int32).astype(jnp.int8)
    actions = jax.random.randint(ka, (n_fill,), 0, 4, jnp.int32)
    rewards = jax.random.uniform(kr, (n_fill,), jnp.float32)
    dones = jnp.zeros((n_fill,), bool)
    return jax.jit(replaylib.replay_add)(
        buf, boards, actions, rewards, dones, nxt, jnp.ones((n_fill,), bool)
    )


def main():
    results = {}
    for fused in (False, True):
        acfg = dqnlib.DQNConfig(memory_size=4096, fused_conv=fused)
        model, agent = dqnlib.create_train_state(acfg, jax.random.PRNGKey(0))
        tx = dqnlib.make_optimizer(acfg)
        buf = make_buffer(acfg)

        @functools.partial(jax.jit, static_argnums=1, donate_argnums=0)
        def full(carry, n, model=model, tx=tx, acfg=acfg, buf=buf):
            def body(c, _):
                agent, rng = c
                rng, ks = jax.random.split(rng)
                bt, _, _ = replaylib.replay_sample(buf, ks, 64, acfg.alpha, acfg.beta)
                agent, m = dqnlib.train_step(acfg, model, tx, agent, bt)
                return (agent, rng), m["loss"]
            return jax.lax.scan(body, carry, None, length=n)

        carry = (agent, jax.random.PRNGKey(2))
        t0 = time.perf_counter()
        results[f"full_fused={fused}"] = timeit(full, carry, 100)
        print(f"full_fused={fused}: {results[f'full_fused={fused}']:.3f} ms "
              f"(wall {time.perf_counter()-t0:.0f}s)", flush=True)

        if not fused:
            # fwd+bwd only: grads computed, params NOT updated
            @functools.partial(jax.jit, static_argnums=1, donate_argnums=0)
            def fwdbwd(carry, n, model=model, acfg=acfg, buf=buf):
                def body(c, _):
                    agent, rng = c
                    rng, ks, kd = jax.random.split(rng, 3)
                    bt, _, _ = replaylib.replay_sample(buf, ks, 64, acfg.alpha, acfg.beta)
                    targets = dqnlib.dqn_targets(acfg, model, agent.target_params, bt)

                    def loss_fn(params):
                        q = model.apply({"params": params}, bt["board"], train=True,
                                        rngs={"dropout": kd})
                        qt = jnp.take_along_axis(q, bt["action"][:, None], -1)[:, 0]
                        return jnp.mean((targets - qt) ** 2) / 4
                    loss, grads = jax.value_and_grad(loss_fn)(agent.params)
                    gn = sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree.leaves(grads))
                    return (agent.replace(rng=rng), rng), loss + gn * 0
                return jax.lax.scan(body, carry, None, length=n)

            model2, agentb = dqnlib.create_train_state(acfg, jax.random.PRNGKey(0))
            results["fwd_bwd_only"] = timeit(fwdbwd, (agentb, jax.random.PRNGKey(2)), 50)
            print(f"fwd_bwd_only: {results['fwd_bwd_only']:.3f} ms", flush=True)

            # Adam apply only (constant grads)
            model3, agentc = dqnlib.create_train_state(acfg, jax.random.PRNGKey(0))
            grads0 = jax.tree.map(lambda p: jnp.ones_like(p) * 1e-6, agentc.params)

            @functools.partial(jax.jit, static_argnums=1, donate_argnums=0)
            def adam_only(carry, n, tx=tx, grads0=grads0):
                def body(agent, _):
                    updates, opt_state = tx.update(grads0, agent.opt_state, agent.params)
                    params = optax.apply_updates(agent.params, updates)
                    return agent.replace(params=params, opt_state=opt_state), 0.0
                return jax.lax.scan(body, carry, None, length=n)

            results["adam_only"] = timeit(adam_only, agentc, 100)
            print(f"adam_only: {results['adam_only']:.3f} ms", flush=True)

            # target fwd only (no dropout, inference)
            model4, agentd = dqnlib.create_train_state(acfg, jax.random.PRNGKey(0))

            @functools.partial(jax.jit, static_argnums=1)
            def tgt_fwd(carry, n, model=model, acfg=acfg, buf=buf):
                def body(c, _):
                    rng = c
                    rng, ks = jax.random.split(rng)
                    bt, _, _ = replaylib.replay_sample(buf, ks, 64, acfg.alpha, acfg.beta)
                    t = dqnlib.dqn_targets(acfg, model, agentd.target_params, bt)
                    return rng, jnp.sum(t)
                return jax.lax.scan(body, carry, None, length=n)

            results["sample_plus_target_fwd"] = timeit(tgt_fwd, jax.random.PRNGKey(2), 100)
            print(f"sample_plus_target_fwd: {results['sample_plus_target_fwd']:.3f} ms",
                  flush=True)

    for k, v in results.items():
        print(f"{k}: {v:.3f} ms ({1e3/v:.1f}/s)")
    with open("docs/learner_profile.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
