"""Microbench the hashed-Q-table primitive ops on TPU.

Which op binds the tabular step? Times each primitive in isolation in a
scan at a given batch. All big arrays are threaded as jit ARGUMENTS —
closure constants of this size (128-512 MB) blow the tunneled
remote-compile request (see tpu2048/eval/evaluate.py Policy docstring).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpu2048.agents import tabular as tab


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


def bench(name, fn, carry):
    @functools.partial(jax.jit, static_argnums=1)
    def run(carry, n):
        return jax.lax.scan(fn, carry, jnp.arange(n))

    print(f"{name}: {timeit(run, carry):.3f} ms", flush=True)


def main(batch=1024, cap_log2=25):
    s = 1 << cap_log2
    nb = s // 16
    k = jax.random.PRNGKey(0)
    key_lo = jax.random.bits(k, (s,), jnp.uint32)
    q = jnp.zeros((s, 4), jnp.float32)
    table = tab.qtable_init(cap_log2)

    def idx(i, hi):
        return jax.random.randint(jax.random.fold_in(k, i), (batch,), 0, hi)

    def f1(c, i):  # bucket-row gather x2 (the NEW probe pattern)
        kl, acc = c
        rows = kl.reshape(nb, 16)[idx(i, nb)]
        rows2 = kl.reshape(nb, 16)[idx(i + 7, nb)]
        return (kl, acc + jnp.sum(rows) + jnp.sum(rows2)), 0

    bench("bucket_row_gather_x2", f1, (key_lo, jnp.uint32(0)))

    def f2(c, i):  # (B,16) element window gather x2 (OLD linear probe)
        kl, acc = c
        base = idx(i, s - 16)
        slots = base[:, None] + jnp.arange(16)[None, :]
        base2 = idx(i + 7, s - 16)
        slots2 = base2[:, None] + jnp.arange(16)[None, :]
        return (kl, acc + jnp.sum(kl[slots]) + jnp.sum(kl[slots2])), 0

    bench("elem_window_gather_x2", f2, (key_lo, jnp.uint32(0)))

    def f3(c, i):  # q row gather
        qq, acc = c
        return (qq, acc + jnp.sum(qq[idx(i, s)])), 0

    bench("q_row_gather", f3, (q, jnp.float32(0)))

    def f4(c, i):  # claim element scatter x1
        kl, acc = c
        return (kl.at[idx(i, s)].set(jnp.uint32(1)), acc + 1), 0

    bench("claim_elem_scatter_x1", f4, (key_lo + 0, jnp.uint32(0)))

    def f5(c, i):  # verify element gather x1
        kl, acc = c
        return (kl, acc + jnp.sum(kl[idx(i, s)])), 0

    bench("verify_elem_gather_x1", f5, (key_lo, jnp.uint32(0)))

    def f6(c, i):  # q row scatter-add
        qq, acc = c
        return (qq.at[idx(i, s)].add(jnp.ones((batch, 4), jnp.float32)),
                acc + 1.0), 0

    bench("q_row_scatter_add", f6, (q + 0, jnp.float32(0)))

    boards = jax.random.randint(k, (batch, 4, 4), 0, 12,
                                jnp.int32).astype(jnp.int8)

    def f7(c, i):  # composed action selection (probe + q gather)
        tbl, acc = c
        b = jnp.clip(boards + jax.random.randint(
            jax.random.fold_in(k, i), (batch, 1, 1), 0, 3
        ).astype(jnp.int8), 0, 14)
        acts, _ = tab.choose_actions_probed(
            tbl, b, 0.1, jax.random.fold_in(k, i))
        return (tbl, acc + acts[0]), 0

    bench("choose_actions_probed", f7, (table, jnp.int32(0)))

    def f8(c, i):  # composed select + update (probe reused)
        tbl, acc = c
        b = jnp.clip(boards + jax.random.randint(
            jax.random.fold_in(k, i), (batch, 1, 1), 0, 3
        ).astype(jnp.int8), 0, 14)
        acts, probe = tab.choose_actions_probed(
            tbl, b, 0.1, jax.random.fold_in(k, i))
        tbl = tab.qtable_update(tbl, b, acts, jnp.ones((batch,)), 0.1,
                                probe=probe)
        return (tbl, acc + acts[0]), 0

    bench("probed_select_plus_update", f8, (table, jnp.int32(0)))


if __name__ == "__main__":
    main(batch=int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
