"""A/B the fused single-4x4-conv block vs the 4-launch path in the REAL
train_step at batch 64 (VERDICT r3 item 5: measure the delta, document
even a negative result). fused_conv=True assembles the zero-embedded 4x4
kernel per apply (models/dqn.py MultiKernelConvBlock.fused)."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpu2048.agents import dqn as dqnlib
from tpu2048.replay import buffer as replaylib


def main():
    for fused in (False, True):
        acfg = dqnlib.DQNConfig(memory_size=4096, fused_conv=fused)
        model, agent = dqnlib.create_train_state(acfg, jax.random.PRNGKey(0))
        tx = dqnlib.make_optimizer(acfg)
        buf = replaylib.replay_init(acfg.memory_size)
        kk = jax.random.PRNGKey(1)
        boards = jax.random.randint(kk, (1024, 4, 4), 0, 12,
                                    jnp.int32).astype(jnp.int8)
        buf = jax.jit(replaylib.replay_add)(
            buf, boards, jnp.zeros((1024,), jnp.int32),
            jnp.ones((1024,), jnp.float32), jnp.zeros((1024,), bool),
            boards, jnp.ones((1024,), bool))

        @functools.partial(jax.jit, static_argnums=1, donate_argnums=0)
        def run(carry, n, model=model, tx=tx, acfg=acfg, buf=buf):
            def body(c, _):
                agent, rng = c
                rng, ks = jax.random.split(rng)
                bt, _, _ = replaylib.replay_sample(buf, ks, 64, acfg.alpha,
                                                   acfg.beta)
                agent, m = dqnlib.train_step(acfg, model, tx, agent, bt)
                return (agent, rng), m["loss"]
            return jax.lax.scan(body, carry, None, length=n)

        carry = (agent, jax.random.PRNGKey(2))
        carry, losses = run(carry, 100)
        float(np.asarray(losses[-1]))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            carry, losses = run(carry, 100)
            float(np.asarray(losses[-1]))
            best = min(best, (time.perf_counter() - t0) / 100)
        print(f"train_step fused_conv={fused}: {best*1e3:.3f} ms "
              f"({1.0/best:.1f} updates/s)", flush=True)


if __name__ == "__main__":
    main()
