"""Sharded replay memory: S independent per-device shards via ``vmap``.

Multi-chip design (SURVEY.md §2b, §5): transitions never cross the
``data`` mesh axis. The buffer carries a leading shard dimension ``(S,
C/S, ...)``; the S envs-per-shard insert into their own shard, sampling
draws ``batch/S`` per shard, and priority updates scatter locally. Under a
``NamedSharding(P("data"))`` on the shard axis, XLA keeps every operation
device-local — the only cross-device traffic in the DQN learner is the
gradient allreduce.

With ``S=1`` this degrades to the single-chip buffer (one shard).
All functions are the ``vmap`` of the flat ops in
:mod:`tpu2048.replay.buffer`, so behavior per shard is identical to the
reference-parity implementation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu2048.replay import buffer as flat

# Re-export: a sharded buffer is the same pytree with a leading shard axis.
ReplayBuffer = flat.ReplayBuffer


def sharded_init(capacity: int, shards: int) -> flat.ReplayBuffer:
    """(S, C/S, ...) buffer; ``capacity`` is the global capacity."""
    if capacity % shards:
        raise ValueError(f"capacity {capacity} not divisible by {shards}")
    per = capacity // shards
    return jax.vmap(lambda _: flat.replay_init(per))(jnp.arange(shards))


def sharded_add(buffer, boards, actions, rewards, dones, next_boards, mask):
    """Insert ``(B,)`` transitions, env i -> shard ``i // (B/S)``."""
    s = buffer.ptr.shape[0]
    b = boards.shape[0]
    per = b // s

    def r(x):
        return x.reshape(s, per, *x.shape[1:])

    return jax.vmap(flat.replay_add)(
        buffer, r(boards), r(actions), r(rewards), r(dones), r(next_boards), r(mask)
    )


def sharded_sample(buffer, key, batch_size: int, alpha: float, beta):
    """Sample ``batch_size`` transitions, ``batch/S`` per shard.

    Returns flat ``(batch_size, ...)`` arrays plus per-shard indices
    ``(S, batch/S)`` for priority updates.
    """
    s = buffer.ptr.shape[0]
    per = batch_size // s
    keys = jax.random.split(key, s)
    batch, indices, w = jax.vmap(
        lambda buf, k: flat.replay_sample(buf, k, per, alpha, beta)
    )(buffer, keys)
    flat_batch = {k: v.reshape(batch_size, *v.shape[2:]) for k, v in batch.items()}
    return flat_batch, indices, w.reshape(batch_size)


def sharded_update_priorities(buffer, indices, td_errors, epsilon: float = 1e-6):
    """``indices``: (S, batch/S); ``td_errors``: flat (batch,)."""
    s = indices.shape[0]
    td = td_errors.reshape(s, -1)
    return jax.vmap(
        lambda buf, idx, t: flat.replay_update_priorities(buf, idx, t, epsilon)
    )(buffer, indices, td)


def sharded_prune(buffer, n_to_remove: int):
    """Prune the n worst episodes *per shard* (global n*S).

    The reference prunes the global-10 worst (mainDQL:318-320); per-shard
    pruning keeps the op device-local — a documented multi-chip delta.
    """
    return jax.vmap(lambda buf: flat.prune_low_score_episodes(buf, n_to_remove))(
        buffer
    )


def total_size(buffer) -> jax.Array:
    return jnp.sum(buffer.size)
