"""Diagnose the Q-table's per-step cost model on TPU.

Two competing theories for the ~3.6 ms fixed cost per tabular step
(DESIGN §5b³):
  (A) per-OP overhead — every gather/scatter against the big table costs
      ~0.3 ms regardless of operand size;
  (B) scatter-COPY — XLA materializes a copy of the scattered operand
      (cost scales with table SIZE, gathers free).
Discriminator: time one gather op and one scatter op in isolation at two
table sizes (2^25 vs 2^16 slots). A: both ops cost the same at both
sizes. B: the scatter tracks table size, the gather does not.

All big arrays are jit ARGUMENTS (closure constants of this size hang
the tunneled remote-compile). Scans donate their carry so in-place
scatters are at least possible.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(run, carry, n=64, reps=3):
    carry, y = run(carry, n)
    jax.block_until_ready(carry)
    float(np.asarray(y).reshape(-1)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        carry, y = run(carry, n)
        float(np.asarray(y).reshape(-1)[0])
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def bench(name, fn, carry, donate=True):
    kw = dict(donate_argnums=0) if donate else {}
    @functools.partial(jax.jit, static_argnums=1, **kw)
    def run(carry, n):
        return jax.lax.scan(fn, carry, jnp.arange(n))

    print(f"{name}: {timeit(run, carry):.3f} ms/iter", flush=True)


def main(batch=1024):
    k = jax.random.PRNGKey(0)
    for cap_log2 in (16, 25):
        s = 1 << cap_log2
        nb = s // 16
        q = jnp.zeros((s, 4), jnp.float32)
        keys = jax.random.bits(k, (nb, 32), jnp.uint32)

        def idx(i, hi):
            return jax.random.randint(
                jax.random.fold_in(k, i), (batch,), 0, hi)

        def g1(c, i, nb=nb):  # one bucket-row gather (128 B rows)
            kk, acc = c
            return (kk, acc + jnp.sum(kk[idx(i, nb)])), 0

        bench(f"gather_bucket_row cap=2^{cap_log2}", g1,
              (keys, jnp.uint32(0)))

        def g2(c, i, s=s):  # one q row gather
            qq, acc = c
            return (qq, acc + jnp.sum(qq[idx(i, s)])), 0

        bench(f"gather_q_row     cap=2^{cap_log2}", g2, (q, jnp.float32(0)))

        def s1(c, i, s=s):  # one q row scatter-add
            qq, acc = c
            return (qq.at[idx(i, s)].add(
                jnp.ones((batch, 4), jnp.float32)), acc + 1.0), 0

        bench(f"scatter_q_rowadd cap=2^{cap_log2}", s1,
              (q + 0, jnp.float32(0)))

        def s2(c, i, nb=nb):  # one flat element scatter into keys (claim)
            kk, acc = c
            j = idx(i, nb * 32)
            flat = kk.reshape(-1).at[j].set(jnp.uint32(1), mode="drop")
            return (flat.reshape(nb, 32), acc + 1), 0

        bench(f"scatter_keys_set cap=2^{cap_log2}", s2,
              (keys + 0, jnp.uint32(0)))


if __name__ == "__main__":
    main(batch=int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
