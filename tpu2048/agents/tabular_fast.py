"""Packed Q-table fast path: the tabular hot loop on explicit-DMA kernels.

The training-internal representation of :class:`tpu2048.agents.tabular.QTable`
used by the tabular train driver: one slot-major ``(S + 1, 8) uint32``
array (``ops/table_kernel.py`` layout — per row ``[key_lo, key_hi,
q0..q3 bitcast, pad, pad]``, row ``S`` = write-only trash). All big-table
traffic per train step is exactly THREE kernel ops — gather(s-buckets),
gather(s'-buckets), scatter(updated slot rows) — instead of the ~10
serialized XLA gathers/scatters of the legacy path (docs/DESIGN.md §5b³).
Probe/claim/TD logic runs on the small gathered ``(B, 16, 8)`` arrays in
plain jnp, SHARED between the Pallas and the XLA backends, so the two
backends are bit-exact by construction and the only difference under test
is how bytes move.

Semantics vs the legacy ops (tpu2048/agents/tabular.py):

* Same hash, same bucketed probe, same defaultdict-zeros reads, same
  additive combining of duplicate same-key updates in one batch, same
  Q-update formula (Agent/main.py:40-43).
* Claim races (two DIFFERENT keys resolving to the same free slot in one
  batch) have a DETERMINISTIC winner here — the lowest batch index — where
  the legacy scatter's winner is whatever XLA's conflicting-write order
  produces. Losers drop and count in ``dropped`` in both. (The serial
  reference cannot race at all; both policies are documented deltas.)

The reference behavior this accelerates: the tabular agent's whole hot
loop (/root/reference/QLearningBase/Agent/main.py:91-99).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from tpu2048.agents import tabular as tab
from tpu2048.ops import table_kernel as tk

assert tk.BUCKET == tab.PROBES, "kernel bucket width must match PROBES"


@struct.dataclass
class PackedQTable:
    data: jax.Array  # (S + 1, 8) uint32; row S = write-only trash
    dropped: jax.Array  # () int32

    @property
    def capacity(self) -> int:
        return self.data.shape[0] - 1

    @property
    def occupied(self) -> jax.Array:
        """(S,) bool — same key-sentinel rule as QTable.occupied."""
        d = self.data[:-1]
        return (d[:, 0] != 0) | (d[:, 1] != 0)


def pack_qtable(table: tab.QTable) -> PackedQTable:
    """QTable -> packed layout (one-time, at train start / load)."""
    s = table.capacity
    data = jnp.concatenate(
        [
            table.key_lo[:, None],
            table.key_hi[:, None],
            jax.lax.bitcast_convert_type(table.q, jnp.uint32),
            jnp.zeros((s, 2), jnp.uint32),
        ],
        axis=1,
    )
    data = jnp.concatenate([data, jnp.zeros((1, tk.WIDTH), jnp.uint32)])
    return PackedQTable(data=data, dropped=table.dropped)


def unpack_qtable(packed: PackedQTable) -> tab.QTable:
    """Packed -> QTable (for save_qtable / eval / the legacy oracle)."""
    d = packed.data[:-1]
    return tab.QTable(
        key_lo=d[:, 0],
        key_hi=d[:, 1],
        q=jax.lax.bitcast_convert_type(d[:, 2:6], jnp.float32),
        dropped=packed.dropped,
    )


def packed_init(capacity_log2: int) -> PackedQTable:
    s = 1 << capacity_log2
    return PackedQTable(
        data=jnp.zeros((s + 1, tk.WIDTH), jnp.uint32),
        dropped=jnp.zeros((), jnp.int32),
    )


def _gather(packed: PackedQTable, buckets, backend: str):
    if backend == "pallas":
        return tk.bucket_gather(packed.data, buckets)
    if backend == "interpret":
        return tk.bucket_gather(packed.data, buckets, interpret=True)
    return tk.bucket_gather_xla(packed.data, buckets)


def _scatter(packed: PackedQTable, slots, rows, backend: str):
    if backend == "pallas":
        data = tk.slot_scatter(packed.data, slots, rows)
    elif backend == "interpret":
        data = tk.slot_scatter(packed.data, slots, rows, interpret=True)
    else:
        data = tk.slot_scatter_xla(packed.data, slots, rows)
    return data


def _probe_gathered(g, lo, hi):
    """Probe on gathered buckets ``(B, 16, 8)``: bucket-local match/free.

    Returns ``(match_idx, free_idx, q_rows)`` — indices are -1 when absent;
    ``q_rows`` is the matched slot's Q-row (zeros for unseen states, the
    reference's defaultdict semantics, Agent/main.py:16).
    """
    wlo, whi = g[:, :, 0], g[:, :, 1]
    real = ((lo | hi) != 0)[:, None]
    match = (wlo == lo[:, None]) & (whi == hi[:, None]) & real
    free = (wlo == 0) & (whi == 0) & real
    first_match = jnp.argmax(match, axis=1).astype(jnp.int32)
    has_match = jnp.any(match, axis=1)
    first_free = jnp.argmax(free, axis=1).astype(jnp.int32)
    has_free = jnp.any(free, axis=1)
    q_rows = jax.lax.bitcast_convert_type(
        jnp.take_along_axis(
            g[:, :, 2:6], first_match[:, None, None], axis=1
        )[:, 0],
        jnp.float32,
    )
    q_rows = jnp.where(has_match[:, None], q_rows, 0.0)
    match_idx = jnp.where(has_match, first_match, -1)
    free_idx = jnp.where(has_free, first_free, -1)
    return match_idx, free_idx, q_rows


def fast_choose_actions_probed(
    packed: PackedQTable, boards, epsilon, key, backend: str = "xla"
):
    """Batched epsilon-greedy on the packed table (Agent/main.py:34-38).

    Bit-exact with :func:`tpu2048.agents.tabular.choose_actions_probed`
    given the same key (identical RNG op sequence + identical Q reads).
    Returns ``(actions, probe)`` where ``probe`` carries everything
    :func:`fast_update` needs to skip re-reading the s-buckets.
    """
    b = boards.shape[0]
    k_expl, k_act = jax.random.split(key)
    explore = jax.random.uniform(k_expl, (b,)) < epsilon
    random_actions = jax.random.randint(k_act, (b,), 0, 4)
    lo, hi = tab.pack_board(boards)
    bucket = tab._hash(lo, hi, packed.capacity // tab.PROBES)
    g = _gather(packed, bucket, backend)
    match_idx, free_idx, q_rows = _probe_gathered(g, lo, hi)
    greedy = jnp.argmax(q_rows, axis=-1).astype(jnp.int32)
    actions = jnp.where(explore, random_actions, greedy)
    return actions, (lo, hi, bucket, match_idx, free_idx, q_rows)


def fast_targets(
    packed: PackedQTable, rewards, next_boards, dones, discount,
    backend: str = "xla",
):
    """``r + gamma * max_a' Q[s'] * (1 - done)`` (Agent/main.py:40-43)."""
    lo, hi = tab.pack_board(next_boards)
    bucket = tab._hash(lo, hi, packed.capacity // tab.PROBES)
    g = _gather(packed, bucket, backend)
    _, _, q_rows = _probe_gathered(g, lo, hi)
    best = jnp.max(q_rows, axis=-1)
    return rewards + discount * best * (1.0 - dones.astype(jnp.float32))


def resolve_updates(probe, actions, targets, learning_rate, trash: int):
    """Shared claim/dedup resolution: probe + TD -> distinct row writes.

    Semantics (all backends; see module docstring for the one documented
    delta vs the legacy scatter):

    * every entry's TD uses the PRE-update Q (additive batch combining,
      like the legacy scatter-add);
    * same-slot entries group; a group's row write accumulates every
      member's TD contribution;
    * a group claiming a FREE slot keeps only members sharing the
      lowest-batch-index member's key — other keys lose the claim, drop,
      and count (the legacy claim-verify drop, deterministic winner);
    * entries with no slot (full bucket) drop and count.

    Returns ``(slots, rows, n_dropped)`` with ``slots[i]`` in
    ``[0, trash]`` and mutually distinct below ``trash`` — the
    slot_scatter contract.
    """
    lo, hi, bucket, match_idx, free_idx, q_rows = probe
    b = lo.shape[0]
    idx = jnp.where(match_idx >= 0, match_idx, free_idx)
    valid = idx >= 0
    slot = bucket * tab.PROBES + jnp.maximum(idx, 0)
    is_new = (match_idx < 0) & valid

    onehot = jax.nn.one_hot(actions, 4, dtype=jnp.float32)
    # Matched rows read their stored Q; fresh claims read zeros (the probe
    # already returns zeros for unmatched rows).
    q_sa = jnp.sum(q_rows * onehot, axis=1)
    td_rows = (
        learning_rate * (targets - q_sa)
    )[:, None] * onehot  # (B, 4) contribution of each entry

    # Group by slot: stable sort keeps batch order inside a group, so the
    # group leader (first sorted member) is the lowest batch index.
    sort_key = jnp.where(valid, slot, jnp.int32(0x7FFFFFFF))
    order = jnp.argsort(sort_key, stable=True)
    s_slot = sort_key[order]
    s_valid = valid[order]
    pos = jnp.arange(b, dtype=jnp.int32)
    is_lead = jnp.concatenate(
        [jnp.ones((1,), bool), s_slot[1:] != s_slot[:-1]]
    )
    # Index of each entry's group leader (max-scan of leader positions).
    lead_pos = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_lead, pos, 0)
    )
    group = jnp.cumsum(is_lead.astype(jnp.int32)) - 1  # (B,) segment ids

    # Claim verification: members of a NEW group must share the leader's
    # key; the leader itself always keeps (it wrote the key).
    s_lo, s_hi = lo[order], hi[order]
    s_new = is_new[order]
    key_ok = (s_lo == s_lo[lead_pos]) & (s_hi == s_hi[lead_pos])
    keep = s_valid & (~s_new | key_ok)
    n_dropped = jnp.sum((~keep & s_valid) | ~s_valid, axis=0).astype(
        jnp.int32
    )

    contrib = jnp.where(keep[:, None], td_rows[order], 0.0)
    td_sum = jax.ops.segment_sum(contrib, group, num_segments=b)  # (B, 4)
    new_q = q_rows[order][lead_pos] + td_sum[group]  # leader's pre-Q + group TD

    rows = jnp.concatenate(
        [
            s_lo[:, None],
            s_hi[:, None],
            jax.lax.bitcast_convert_type(new_q, jnp.uint32),
            jnp.zeros((b, 2), jnp.uint32),
        ],
        axis=1,
    )
    write = is_lead & s_valid
    slots = jnp.where(write, s_slot, trash)
    return slots, rows, n_dropped


def fast_update(
    packed: PackedQTable, probe, actions, targets, learning_rate,
    backend: str = "xla",
) -> PackedQTable:
    """Batched Q-update on the packed table (Agent/main.py:40-43).

    ``probe`` is the tuple from :func:`fast_choose_actions_probed` on the
    SAME table and boards (the table does not change between action
    selection and the update, exactly like the legacy probe reuse).
    """
    slots, rows, n_dropped = resolve_updates(
        probe, actions, targets, learning_rate, trash=packed.capacity
    )
    data = _scatter(packed, slots, rows, backend)
    return PackedQTable(data=data, dropped=packed.dropped + n_dropped)


def fast_lookup(packed: PackedQTable, boards, backend: str = "xla"):
    """Batched read: ``(B, 4)`` Q-values, zeros for unseen states."""
    lo, hi = tab.pack_board(boards)
    bucket = tab._hash(lo, hi, packed.capacity // tab.PROBES)
    g = _gather(packed, bucket, backend)
    _, _, q_rows = _probe_gathered(g, lo, hi)
    return q_rows
