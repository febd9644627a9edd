"""Device-resident replay memory (uniform + prioritized), fully jittable.

TPU-native re-design of the reference's ``PrioritizedSequentialMemory``
(/root/reference/Deep_QLearning/main_dir/Dqn8TestNOPERCNN.py:22-200), which
wraps keras-rl ring buffers on the host. Here the whole buffer lives in HBM
as fixed-shape arrays; every operation (batched insert, priority^alpha
sampling, priority update, episode pruning) is a pure function running
under jit — no host round-trips in the training loop.

Behavioral notes vs the reference:

* Transitions store ``next_board`` explicitly. The reference reconstructs
  ``next_state = observations[i+1]`` (Dqn8:48-65), which silently crosses
  episode boundaries when adjacent entries belong to different episodes;
  storing s' removes that class of bug (SURVEY.md §2 row 9). Boards are
  int8 log-tile exponents (16 bytes each) — one-hot encoding happens on
  read in the learner, so a 50k-capacity buffer costs ~2 MB.
* ``alpha=0`` (the reference's run-of-record, Dqn8:249 — "NOPER") makes
  sampling uniform; PER is fully implemented but defaulted off for parity.
* ``sample`` returns importance weights exactly like the reference
  (normalized by the batch max, Dqn8:92-94); the reference then discards
  them (Dqn8:357) and so does our default DQN loss — also for parity.
* ``prune_low_score_episodes`` reproduces ``clean_low_score_episodes``
  (Dqn8:119-200): group by ``done``, score = sum of positive rewards, drop
  the n worst episodes, keep the trailing incomplete episode. The
  reference's priority remap bug (old-position indexing, Dqn8:195-198) is
  fixed: priorities travel with their transitions.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct


@dataclasses.dataclass(frozen=True)
class ReplayConfig:
    """Defaults = the reference DQN run of record (Dqn8:249)."""

    capacity: int = 50_000
    alpha: float = 0.0  # priority exponent; 0 = uniform ("NOPER")
    beta: float = 1.0  # importance-sampling exponent
    beta_increment: float = 1e-5  # reference defines it; increment is
    # commented out (Dqn8:343) — kept for config parity.
    priority_epsilon: float = 1e-6  # Dqn8:97


@struct.dataclass
class ReplayBuffer:
    boards: jax.Array  # (C, 4, 4) int8
    next_boards: jax.Array  # (C, 4, 4) int8
    actions: jax.Array  # (C,) int8
    rewards: jax.Array  # (C,) f32
    dones: jax.Array  # (C,) bool
    priorities: jax.Array  # (C,) f32
    max_priority: jax.Array  # () f32
    ptr: jax.Array  # () int32 next write slot
    size: jax.Array  # () int32 valid entries

    @property
    def capacity(self) -> int:
        return self.boards.shape[0]


def replay_init(capacity: int) -> ReplayBuffer:
    return ReplayBuffer(
        boards=jnp.zeros((capacity, 4, 4), jnp.int8),
        next_boards=jnp.zeros((capacity, 4, 4), jnp.int8),
        actions=jnp.zeros((capacity,), jnp.int8),
        rewards=jnp.zeros((capacity,), jnp.float32),
        dones=jnp.zeros((capacity,), bool),
        priorities=jnp.zeros((capacity,), jnp.float32),
        max_priority=jnp.ones((), jnp.float32),  # Dqn8:29
        ptr=jnp.zeros((), jnp.int32),
        size=jnp.zeros((), jnp.int32),
    )


def replay_add(
    buffer: ReplayBuffer, boards, actions, rewards, dones, next_boards, mask
):
    """Insert up to B transitions (those with ``mask`` True), compacted.

    Masked-out entries (the actor's dedup skips, Dqn8:283-297) consume no
    slots. New entries get ``max_priority`` (Dqn8:44-46). Ring semantics:
    oldest entries are overwritten once full.
    """
    c = buffer.capacity
    mask = mask.astype(jnp.int32)
    offsets = jnp.cumsum(mask) - 1  # position among accepted entries
    n_added = jnp.sum(mask)
    pos = (buffer.ptr + offsets) % c
    # Route rejected entries to a scratch slot then restore it: cheaper than
    # predicated scatter. Scratch slot = the slot that will be written last
    # is unsafe; use a dedicated approach: write rejected to slot `ptr-1`?
    # Simplest correct approach: scatter with mode drop via where on index.
    pos = jnp.where(mask.astype(bool), pos, c)  # c = out-of-bounds -> dropped
    buf = buffer.replace(
        boards=buffer.boards.at[pos].set(boards, mode="drop"),
        next_boards=buffer.next_boards.at[pos].set(next_boards, mode="drop"),
        actions=buffer.actions.at[pos].set(actions.astype(jnp.int8), mode="drop"),
        rewards=buffer.rewards.at[pos].set(
            rewards.astype(jnp.float32), mode="drop"
        ),
        dones=buffer.dones.at[pos].set(dones, mode="drop"),
        priorities=buffer.priorities.at[pos].set(
            jnp.broadcast_to(buffer.max_priority, pos.shape), mode="drop"
        ),
        ptr=(buffer.ptr + n_added) % c,
        size=jnp.minimum(buffer.size + n_added, c),
    )
    return buf


def _probabilities(buffer: ReplayBuffer, alpha: float):
    """Per-slot sampling probabilities (Dqn8:75-83)."""
    c = buffer.capacity
    in_range = jnp.arange(c) < buffer.size
    if alpha == 0.0:
        p = in_range.astype(jnp.float32)
    else:
        p = jnp.where(in_range, buffer.priorities ** alpha, 0.0)
        # Reference falls back to uniform when all priorities are zero.
        p = jnp.where(jnp.sum(p) > 0, p, in_range.astype(jnp.float32))
    return p / jnp.maximum(jnp.sum(p), 1e-30)


def replay_sample(
    buffer: ReplayBuffer, key, batch_size: int, alpha: float, beta
):
    """Sample a batch (Dqn8:67-95).

    Returns ``(batch dict, indices, is_weights)``; ``is_weights`` are
    normalized by the batch max exactly like the reference.
    """
    if alpha == 0.0:
        # Uniform ("NOPER", the run of record, Dqn8:249): a direct
        # randint draw over the valid range — identical distribution to
        # the categorical over flat logits below, without materializing
        # (B, C) gumbel noise per update. IS weights are exactly 1
        # ((n * 1/n)^-beta, then batch-max normalized).
        indices = jax.random.randint(
            key, (batch_size,), 0, jnp.maximum(buffer.size, 1)
        )
        w = jnp.ones((batch_size,), jnp.float32)
    else:
        p = _probabilities(buffer, alpha)
        logits = jnp.log(jnp.maximum(p, 1e-30))
        indices = jax.random.categorical(key, logits, shape=(batch_size,))
        n = jnp.maximum(buffer.size.astype(jnp.float32), 1.0)
        w = (n * p[indices]) ** (-beta)
        w = w / jnp.maximum(jnp.max(w), 1e-30)
    batch = {
        "board": buffer.boards[indices],
        "action": buffer.actions[indices].astype(jnp.int32),
        "reward": buffer.rewards[indices],
        "done": buffer.dones[indices],
        "next_board": buffer.next_boards[indices],
    }
    return batch, indices, w


def replay_update_priorities(
    buffer: ReplayBuffer, indices, td_errors, epsilon: float = 1e-6
):
    """``priority[i] = |td| + eps``; bump ``max_priority`` (Dqn8:97-104)."""
    p = jnp.abs(td_errors) + epsilon
    priorities = buffer.priorities.at[indices].set(p)
    return buffer.replace(
        priorities=priorities,
        max_priority=jnp.maximum(buffer.max_priority, jnp.max(p)),
    )


def _logical_order(buffer: ReplayBuffer):
    """Physical indices sorted oldest -> newest, and validity mask."""
    c = buffer.capacity
    i = jnp.arange(c)
    phys = (buffer.ptr - buffer.size + i) % c
    valid = i < buffer.size
    return phys, valid


def replay_peek(buffer: ReplayBuffer, back: int = 0):
    """Transition ``back`` entries before the newest (Dqn8:109-117)."""
    idx = (buffer.ptr - 1 - back) % buffer.capacity
    return {
        "board": buffer.boards[idx],
        "action": buffer.actions[idx].astype(jnp.int32),
        "reward": buffer.rewards[idx],
        "done": buffer.dones[idx],
        "next_board": buffer.next_boards[idx],
    }


def prune_low_score_episodes(buffer: ReplayBuffer, n_to_remove: int):
    """Drop the ``n_to_remove`` lowest-scoring complete episodes.

    Pure-functional equivalent of ``clean_low_score_episodes``
    (Dqn8:119-200): episodes are ``done``-delimited runs in logical order;
    an episode's score is the sum of its positive rewards; the trailing
    incomplete episode is always kept. Order is preserved ("No shuffle",
    Dqn8:156-159).
    """
    c = buffer.capacity
    phys, valid = _logical_order(buffer)
    rewards = buffer.rewards[phys]
    dones = buffer.dones[phys] & valid

    # Episode id per logical slot: 0-based, increments after each done.
    ends_before = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(dones.astype(jnp.int32))[:-1]]
    )
    ep_id = ends_before  # (C,)
    num_complete = jnp.sum(dones.astype(jnp.int32))

    # Positive-reward sums per episode (Dqn8:148-150).
    pos_r = jnp.where(valid, jnp.maximum(rewards, 0.0), 0.0)
    scores = jax.ops.segment_sum(pos_r, ep_id, num_segments=c)
    ep_ids = jnp.arange(c)
    is_complete = ep_ids < num_complete
    ranked = jnp.argsort(jnp.where(is_complete, scores, jnp.inf))
    worst = ranked[:n_to_remove]  # episode ids to drop (only if complete)
    worst_valid = worst < num_complete

    drop_ep = jnp.zeros((c,), bool).at[worst].set(worst_valid, mode="drop")
    keep = valid & ~drop_ep[ep_id]

    # Stable compaction to the front of fresh arrays.
    new_pos = jnp.where(keep, jnp.cumsum(keep.astype(jnp.int32)) - 1, c)
    new_size = jnp.sum(keep.astype(jnp.int32))

    def compact(src, init):
        return init.at[new_pos].set(src[phys], mode="drop")

    pruned = ReplayBuffer(
        boards=compact(buffer.boards, jnp.zeros_like(buffer.boards)),
        next_boards=compact(
            buffer.next_boards, jnp.zeros_like(buffer.next_boards)
        ),
        actions=compact(buffer.actions, jnp.zeros_like(buffer.actions)),
        rewards=compact(buffer.rewards, jnp.zeros_like(buffer.rewards)),
        dones=compact(buffer.dones, jnp.zeros_like(buffer.dones)),
        priorities=compact(buffer.priorities, jnp.zeros_like(buffer.priorities)),
        max_priority=buffer.max_priority,
        ptr=new_size % c,
        size=new_size,
    )
    # Reference recomputes max_priority from the surviving vector (Dqn8:200).
    mp = jnp.max(pruned.priorities)
    return pruned.replace(
        max_priority=jnp.where(mp > 0, mp, 1.0)
    )
