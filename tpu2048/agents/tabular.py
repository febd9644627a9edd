"""Tabular Q-learning agent — hashed-state Q-table resident in HBM.

TPU-native re-design of the reference's ``QLearningAgent``
(/root/reference/QLearningBase/Agent/main.py:14-57). The reference keys a
``defaultdict(np.zeros(4))`` by the board tuple; here the Q-table is a
fixed-capacity open-addressed hash table of device arrays so that thousands
of lookups and updates run per step as one gather + one scatter:

* A board packs into 64 bits (16 cells x 4-bit exponents), stored as two
  uint32 words (JAX default x64-off).
* Linear probing over ``PROBES`` slots; unseen states read as zeros —
  exactly the reference's defaultdict semantics (Agent/main.py:16).
* Batched Q-update: ``Q[s,a] += lr * (r + gamma * max Q[s'] * (1-done)
  - Q[s,a])`` (Agent/main.py:40-43) as a verified scatter-add. Duplicate
  states inside one batch combine additively (each reads the same pre-update
  value) — a documented delta vs the serial reference.
* The 4-phase piecewise-linear epsilon decay (Agent/main.py:23-32,45-57) is
  reproduced in closed form as a pure function of the epoch.

Full-table capacity is configurable; the default 2**24 slots cost ~0.4 GB
of HBM (a 2048 run effectively never revisits states, so size generously).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

# Probe window = one 16-slot BUCKET (set-associative). Sized for a
# 200k-game run: ~10M distinct states in a 2**25 table is load factor
# ~0.3 (Poisson mean ~4.8 keys per bucket), where a 16-way bucket makes
# insert failure (a dropped update) vanishingly rare — same failure
# envelope as the r2 linear-probe window at this load. The r1 run of
# record at window 8 / 2**24 (load ~0.6) dropped ~17% of fresh-state
# inserts late in training.
#
# Why buckets instead of linear probing: the probe window is the hot
# table pattern (2 key gathers per probed board, 2-3 probes per train
# step). A linear window at arbitrary offsets is a (B, 16) ELEMENT
# gather per key array, while an aligned bucket is a (B,) ROW gather on
# the (S/16, 16) view of the same buffer. Measured on the real chip
# (r4): 621k -> 782k env-steps/s at batch 4096, but 316k -> 251k at
# batch 1024 — XLA lowers big-table gathers/scatters to an effectively
# serialized per-row loop (~0.36 us/row, independent of table SIZE), so
# op count, not descriptor count, is the binding lever; see
# docs/DESIGN.md §5b³ for the measured cost model and the negative
# result of interleaving the key words.
PROBES = 16


@dataclasses.dataclass(frozen=True)
class TabularConfig:
    """Hyperparameters (defaults = Agent/main.py:15)."""

    learning_rate: float = 0.1
    discount: float = 0.9
    exploration_rate: float = 1.0
    exploration_min: float = 0.01
    total_epochs: int = 20000
    capacity_log2: int = 25  # Q-table slots = 2**capacity_log2 (~0.8 GB HBM; a 200k-game run visits ~10M states)


@struct.dataclass
class QTable:
    key_lo: jax.Array  # (S,) uint32 packed cells 0..7
    key_hi: jax.Array  # (S,) uint32 packed cells 8..15
    q: jax.Array  # (S, 4) f32
    dropped: jax.Array  # () int32 — updates lost to probe-window overflow

    @property
    def capacity(self) -> int:
        return self.key_lo.shape[0]

    @property
    def occupied(self) -> jax.Array:
        """(S,) bool — derived: a slot is occupied iff its key is nonzero.

        The all-zero key cannot collide with a real state (a 2048 board
        always has at least one tile), so no separate occupancy array is
        needed — dropping it saves one (B, PROBES) gather per probe and
        one scatter per update on the hot path.
        """
        return (self.key_lo != 0) | (self.key_hi != 0)


def qtable_init(capacity_log2: int = 20) -> QTable:
    s = 1 << capacity_log2
    return QTable(
        key_lo=jnp.zeros((s,), jnp.uint32),
        key_hi=jnp.zeros((s,), jnp.uint32),
        q=jnp.zeros((s, 4), jnp.float32),
        dropped=jnp.zeros((), jnp.int32),
    )


def pack_board(board):
    """``(..., 4, 4)`` int8 exponents -> (lo, hi) uint32 words.

    Exponents clip at 15 to fit 4 bits (tile 32768 — beyond the reference's
    16-channel encoding anyway, Dqn8TestNOPERCNN.py:274).
    """
    cells = jnp.clip(board.reshape(*board.shape[:-2], 16), 0, 15).astype(
        jnp.uint32
    )
    shifts = (jnp.arange(8, dtype=jnp.uint32) * 4)[(None,) * (cells.ndim - 1)]
    lo = jnp.sum(cells[..., :8] << shifts, axis=-1).astype(jnp.uint32)
    hi = jnp.sum(cells[..., 8:] << shifts, axis=-1).astype(jnp.uint32)
    return lo, hi


def _hash(lo, hi, capacity: int):
    """Murmur3-style finalizer over the two words -> slot index."""
    h = lo ^ (hi * jnp.uint32(0x9E3779B1))
    h ^= h >> 16
    h *= jnp.uint32(0x85EBCA6B)
    h ^= h >> 13
    h *= jnp.uint32(0xC2B2AE35)
    h ^= h >> 16
    return (h & jnp.uint32(capacity - 1)).astype(jnp.int32)


def _probe(table: QTable, lo, hi):
    """Vectorized probe: for each key return (match_slot, free_slot).

    ``match_slot``/``free_slot`` are -1 when not found within the window.
    The window is the key's whole PROBES-aligned bucket, gathered as ONE
    row of the ``(S/PROBES, PROBES)`` view of each key array (see the
    PROBES comment for why this beats a linear window on TPU).
    """
    capacity = table.capacity
    n_buckets = capacity // PROBES
    bucket = _hash(lo, hi, n_buckets)  # (B,)
    offs = jnp.arange(PROBES, dtype=jnp.int32)
    slots = bucket[:, None] * PROBES + offs[None, :]  # (B, P) contiguous
    wlo = table.key_lo.reshape(n_buckets, PROBES)[bucket]
    whi = table.key_hi.reshape(n_buckets, PROBES)[bucket]
    # Empty slot <=> key (0, 0) (see QTable.occupied): a real probing key is
    # never all-zero, so key equality alone cannot match an empty slot.
    # An all-zero PROBING key (impossible for a real 2048 board, but
    # representable by a padded/masked caller) would "match" every free
    # slot; guard it to (-1, -1) so such entries read zeros and never
    # claim a slot another state could later inherit.
    real = ((lo | hi) != 0)[:, None]
    match = (wlo == lo[:, None]) & (whi == hi[:, None]) & real
    free = (wlo == 0) & (whi == 0) & real
    first_match = jnp.argmax(match, axis=1)
    has_match = jnp.any(match, axis=1)
    first_free = jnp.argmax(free, axis=1)
    has_free = jnp.any(free, axis=1)
    match_slot = jnp.where(
        has_match, jnp.take_along_axis(slots, first_match[:, None], 1)[:, 0], -1
    )
    free_slot = jnp.where(
        has_free, jnp.take_along_axis(slots, first_free[:, None], 1)[:, 0], -1
    )
    return match_slot, free_slot


def qtable_lookup(table: QTable, boards):
    """Batched read: ``(B, 4)`` Q-values, zeros for unseen states."""
    lo, hi = pack_board(boards)
    match_slot, _ = _probe(table, lo, hi)
    q = table.q[jnp.maximum(match_slot, 0)]
    return jnp.where((match_slot >= 0)[:, None], q, 0.0)


def qtable_update(table: QTable, boards, actions, targets, learning_rate,
                  probe=None):
    """Batched Q-update toward ``targets`` (scatter-add of the TD step).

    Inserts unseen states (claiming a free probe slot, zero-initialized),
    then verifies claims — when two new states race for one slot, the loser
    drops its update and is counted in ``table.dropped``.

    ``probe``: optional ``(lo, hi, match_slot, free_slot)`` from
    :func:`choose_actions_probed` on the SAME table and boards — reuses
    the action-selection probe instead of re-hashing/re-gathering (a probe
    is ~1/3 of the step's table traffic; valid because the table does not
    change between action selection and the update).
    """
    if probe is not None:
        lo, hi, match_slot, free_slot = probe
    else:
        lo, hi = pack_board(boards)
        match_slot, free_slot = _probe(table, lo, hi)
    slot = jnp.where(match_slot >= 0, match_slot, free_slot)
    valid = slot >= 0
    safe_slot = jnp.maximum(slot, 0)

    # Claim free slots (arbitrary winner on conflict), then verify.
    is_new = (match_slot < 0) & valid
    claim_slot = jnp.where(is_new, safe_slot, 0)
    key_lo = table.key_lo.at[claim_slot].set(
        jnp.where(is_new, lo, table.key_lo[claim_slot])
    )
    key_hi = table.key_hi.at[claim_slot].set(
        jnp.where(is_new, hi, table.key_hi[claim_slot])
    )
    # Verify claims: a claimed slot whose key now reads back as ours is won
    # (occupancy is implied — a real key is never (0, 0), QTable.occupied).
    won = (key_lo[safe_slot] == lo) & (key_hi[safe_slot] == hi)
    valid = valid & won

    # Whole-row read-modify-scatter: a 2-index (slot, action) element
    # scatter lowers to an XLA path ~12x slower on TPU than a row
    # scatter-add at the same batch (measured 9.2 ms vs 0.76 ms for 4096
    # updates into a 2**24-row table — TPU gather/scatter cost is
    # per-descriptor, so B row descriptors beat B element descriptors
    # with an extra index dimension). Row .add keeps the documented
    # duplicate-state semantics: same-slot updates combine additively.
    onehot = jax.nn.one_hot(actions, 4, dtype=jnp.float32)
    q_rows = table.q[safe_slot]  # (B, 4) row gather
    q_sa = jnp.sum(q_rows * onehot, axis=1)
    q_sa = jnp.where(is_new & valid, 0.0, q_sa)  # fresh rows read as zero
    td = learning_rate * (targets - q_sa)
    td = jnp.where(valid, td, 0.0)
    q = table.q.at[safe_slot].add(td[:, None] * onehot)

    dropped = table.dropped + jnp.sum((~valid).astype(jnp.int32))
    return QTable(key_lo=key_lo, key_hi=key_hi, q=q, dropped=dropped)


def q_learning_targets(table: QTable, rewards, next_boards, dones, discount):
    """``r + gamma * max_a' Q[s'] * (1 - done)`` (Agent/main.py:40-43)."""
    q_next = qtable_lookup(table, next_boards)
    best = jnp.max(q_next, axis=-1)
    return rewards + discount * best * (1.0 - dones.astype(jnp.float32))


def choose_actions_probed(table: QTable, boards, epsilon, key):
    """Batched epsilon-greedy (Agent/main.py:34-38), returning the probe.

    Random branch is uniform over all 4 actions; greedy branch is argmax of
    the state's Q-row (zeros -> action 0, matching np.argmax on zeros).
    The returned ``(lo, hi, match_slot, free_slot)`` probe can be passed to
    :func:`qtable_update` for the same boards to skip its re-probe.
    """
    b = boards.shape[0]
    k_expl, k_act = jax.random.split(key)
    explore = jax.random.uniform(k_expl, (b,)) < epsilon
    random_actions = jax.random.randint(k_act, (b,), 0, 4)
    lo, hi = pack_board(boards)
    match_slot, free_slot = _probe(table, lo, hi)
    q = table.q[jnp.maximum(match_slot, 0)]
    q = jnp.where((match_slot >= 0)[:, None], q, 0.0)
    greedy = jnp.argmax(q, axis=-1).astype(jnp.int32)
    actions = jnp.where(explore, random_actions, greedy)
    return actions, (lo, hi, match_slot, free_slot)


def choose_actions(table: QTable, boards, epsilon, key):
    """Batched epsilon-greedy (Agent/main.py:34-38)."""
    actions, _ = choose_actions_probed(table, boards, epsilon, key)
    return actions


def epsilon_for_epoch(epoch, config: TabularConfig):
    """Closed form of the reference's iterative 4-phase decay.

    Phases at 30% / 60% / 80% of ``total_epochs`` with per-phase slopes and
    floors (Agent/main.py:23-32,45-57). ``epoch`` is the number of completed
    epochs (decay applications).
    """
    t = float(config.total_epochs)
    e0 = config.exploration_rate
    emin = config.exploration_min
    b1, b2, b3 = 0.30 * t, 0.60 * t, 0.80 * t
    slow1 = (e0 - emin * 1.5) / b1
    fast = ((e0 - emin) - emin * 1.5) / (b2 - b1)
    slow2 = (emin * 1.1 - emin) / (b3 - b2)

    # Integer counts of decay applications per phase: the reference decays
    # once per integer epoch e' < epoch, phase chosen by e' vs the (possibly
    # fractional) boundaries.
    import math

    n1, n2, n3 = math.ceil(b1), math.ceil(b2), math.ceil(b3)
    epoch = jnp.asarray(epoch, jnp.float32)
    k1 = jnp.clip(epoch, 0.0, n1)
    k2 = jnp.clip(epoch - n1, 0.0, n2 - n1)
    k3 = jnp.clip(epoch - n2, 0.0, n3 - n2)
    eps = jnp.maximum(emin * 1.5, e0 - slow1 * k1)
    eps = jnp.where(k2 > 0, jnp.maximum(emin * 1.1, eps - fast * k2), eps)
    eps = jnp.where(k3 > 0, jnp.maximum(emin, eps - slow2 * k3), eps)
    eps = jnp.where(epoch > n3, emin, eps)
    return eps


def save_qtable(path: str, table: QTable) -> None:
    """Persist the Q-table as one compressed .npz.

    The reference never persisted its tabular agent — the dict Q-table
    died with the process (QLearningBase/Agent/main.py has no save path);
    only CSV debug logs survived a run. Saving enables `eval --policy
    tabular` on a trained table.
    """
    import os

    import numpy as np

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(
        path,
        key_lo=np.asarray(table.key_lo),
        key_hi=np.asarray(table.key_hi),
        occupied=np.asarray(table.occupied),
        q=np.asarray(table.q),
        dropped=np.asarray(table.dropped),
        layout=np.asarray("bucketed"),
    )


def rehash_table(table: QTable) -> QTable:
    """Re-place every occupied entry under the current bucketed hashing.

    One-time conversion for tables saved under a different placement
    scheme (the r2/r3 linear-probe layout): occupied entries are sorted by
    their new bucket, ranked within it, and scattered to
    ``bucket * PROBES + rank``; entries past a full bucket are dropped and
    counted in ``dropped`` (vanishingly rare at the shipped load factors).
    Q-values travel with their keys, so lookups return identical values.
    """
    s = table.capacity
    n_buckets = s // PROBES
    occ = (table.key_lo != 0) | (table.key_hi != 0)
    bucket = _hash(table.key_lo, table.key_hi, n_buckets)
    order = jnp.argsort(jnp.where(occ, bucket, n_buckets))  # empties last
    sb = bucket[order]
    so = occ[order]
    idx = jnp.arange(s, dtype=jnp.int32)
    run_start = jnp.concatenate(
        [jnp.ones((1,), bool), sb[1:] != sb[:-1]]
    )
    start_idx = jax.lax.associative_scan(
        jnp.maximum, jnp.where(run_start, idx, 0)
    )
    rank = idx - start_idx
    valid = so & (rank < PROBES)
    dest = jnp.where(valid, sb * PROBES + rank, s)  # s = dropped
    return QTable(
        key_lo=jnp.zeros((s,), jnp.uint32).at[dest].set(
            table.key_lo[order], mode="drop"
        ),
        key_hi=jnp.zeros((s,), jnp.uint32).at[dest].set(
            table.key_hi[order], mode="drop"
        ),
        q=jnp.zeros((s, 4), jnp.float32).at[dest].set(
            table.q[order], mode="drop"
        ),
        dropped=table.dropped
        + jnp.sum((so & ~valid).astype(jnp.int32)),
    )


def load_qtable(path: str) -> QTable:
    import numpy as np

    with np.load(path) as z:
        # Older files carry an explicit "occupied" array; occupancy is now
        # derived from the key sentinel (QTable.occupied), so it is
        # ignored on load (key+occupancy were always written together, so
        # the derived value is identical).
        table = QTable(
            key_lo=jnp.asarray(z["key_lo"]),
            key_hi=jnp.asarray(z["key_hi"]),
            q=jnp.asarray(z["q"]),
            dropped=jnp.asarray(z["dropped"]),
        )
        layout = str(z["layout"]) if "layout" in z else "linear"
    if layout != "bucketed":
        # r2/r3-era file: entries were placed by linear probing from a
        # full-capacity hash; re-place them for bucketed probing.
        table = rehash_table(table)
    return table
