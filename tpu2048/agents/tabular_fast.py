"""Packed Q-table fast path: the tabular hot loop on explicit-DMA kernels.

The training-internal representation of :class:`tpu2048.agents.tabular.QTable`
used by the tabular train driver: one bucket-row ``(n_buckets + 1, 128)
uint32`` array (``ops/table_kernel.py`` layout — bucket = one aligned
128-lane row of 16 slot-major slots ``[key_lo, key_hi, q0..q3 bitcast,
pad, pad]``; the extra row is write-only trash). All big-table traffic
per train step is exactly THREE kernel ops — gather(s-buckets),
gather(s'-buckets), scatter(merged updated bucket images) — instead of
the ~10 serialized XLA gathers/scatters of the legacy path
(docs/DESIGN.md §5b³). Probe/claim/TD logic runs on the small gathered
``(B, 16, 8)`` arrays in plain jnp, SHARED between the Pallas and the XLA
backends, so the two backends are bit-exact by construction and the only
difference under test is how bytes move.

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

_BIG = jnp.int32(0x7FFFFFFF)


@struct.dataclass
class PackedQTable:
    data: jax.Array  # (n_buckets + 1, 128) uint32; last row = trash
    dropped: jax.Array  # () int32

    @property
    def capacity(self) -> int:
        return (self.data.shape[0] - 1) * tk.BUCKET

    @property
    def occupied(self) -> jax.Array:
        """(S,) bool — same key-sentinel rule as QTable.occupied.

        Implemented with strided-LANE slices (``[:, word::WIDTH]``), never
        a full-table ``(S, WIDTH)`` reshape: XLA gives a ``u32[S, 8]``
        intermediate the full (8, 128) tile layout — a 16× lane padding
        that at the run-of-record capacity 2²⁵ is 16 GB of HBM (measured
        OOM, r5). Strided slices keep every temp at ``(n_buckets, 16)``,
        and ``reshape(-1)`` restores global slot order (slot = bucket ·
        BUCKET + lane/WIDTH) because slots are lane-major within a row.
        """
        d = self.data[:-1]
        return ((d[:, 0 :: tk.WIDTH] != 0) | (d[:, 1 :: tk.WIDTH] != 0)).reshape(-1)


def pack_qtable(table: tab.QTable) -> PackedQTable:
    """QTable -> packed layout (one-time, at train start / load).

    Writes each slot word as a strided-lane update on the final
    ``(n_buckets, ROW)`` array instead of materializing a ``(S, WIDTH)``
    intermediate — see ``PackedQTable.occupied`` for why (16× tile
    padding → OOM at capacity 2²⁵). ``(S, 4)``-shaped operands are fine:
    the legacy table stores ``q`` that way through full 200k-game runs.
    """
    s = table.capacity
    nb = s // tk.BUCKET
    data = jnp.zeros((nb, tk.ROW), jnp.uint32)
    data = data.at[:, 0 :: tk.WIDTH].set(table.key_lo.reshape(nb, tk.BUCKET))
    data = data.at[:, 1 :: tk.WIDTH].set(table.key_hi.reshape(nb, tk.BUCKET))
    qu = jax.lax.bitcast_convert_type(table.q, jnp.uint32)  # (S, 4)
    for j in range(4):
        data = data.at[:, 2 + j :: tk.WIDTH].set(qu[:, j].reshape(nb, tk.BUCKET))
    data = jnp.concatenate([data, jnp.zeros((1, tk.ROW), jnp.uint32)])
    return PackedQTable(data=data, dropped=table.dropped)


def unpack_qtable(packed: PackedQTable) -> tab.QTable:
    """Packed -> QTable (for save_qtable / eval / the legacy oracle).

    Strided-lane reads for the same layout reason as ``pack_qtable``.
    """
    d = packed.data[:-1]  # (n_buckets, ROW)
    q = jnp.stack(
        [
            jax.lax.bitcast_convert_type(
                d[:, 2 + j :: tk.WIDTH], jnp.float32
            ).reshape(-1)
            for j in range(4)
        ],
        axis=1,
    )  # (S, 4) — the legacy layout, known-safe at 2²⁵
    return tab.QTable(
        key_lo=d[:, 0 :: tk.WIDTH].reshape(-1),
        key_hi=d[:, 1 :: tk.WIDTH].reshape(-1),
        q=q,
        dropped=packed.dropped,
    )


def packed_init(capacity_log2: int) -> PackedQTable:
    nb = (1 << capacity_log2) // tk.BUCKET
    return PackedQTable(
        data=jnp.zeros((nb + 1, tk.ROW), jnp.uint32),
        dropped=jnp.zeros((), jnp.int32),
    )


def _gather(packed: PackedQTable, buckets, backend: str):
    if backend == "pallas":
        return tk.bucket_gather(packed.data, buckets)
    if backend == "interpret":
        return tk.bucket_gather(packed.data, buckets, interpret=True)
    return tk.bucket_gather_xla(packed.data, buckets)


def _scatter(packed: PackedQTable, buckets, rows, backend: str):
    if backend == "pallas":
        return tk.bucket_scatter(packed.data, buckets, rows)
    if backend == "interpret":
        return tk.bucket_scatter(packed.data, buckets, rows, interpret=True)
    return tk.bucket_scatter_xla(packed.data, buckets, rows)


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
    Returns ``(actions, probe)`` where ``probe`` carries the gathered
    bucket images and the probe results — everything :func:`fast_update`
    needs to skip re-reading the s-buckets.
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
    return actions, (lo, hi, bucket, g, match_idx, free_idx, q_rows)


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
    """Shared claim/merge resolution: probe + TD -> distinct bucket images.

    Semantics (all backends; see module docstring for the one documented
    delta vs the legacy scatter):

    * every entry's TD uses the PRE-update Q (additive batch combining,
      like the legacy scatter-add);
    * same-BUCKET entries group (stable sort); the group's write is ONE
      rebuilt bucket image — the (shared) gathered base with every kept
      member's contribution applied: Q deltas add per (slot, action),
      claimed keys set their slot's key words;
    * entries claiming a FREE slot keep only those sharing the group's
      lowest-batch-index claimant's key — other keys lose the claim, drop,
      and count (all of a bucket's claimants target the same first-free
      slot, so the race is exactly the legacy one with a deterministic
      winner);
    * entries with no slot (full bucket) drop and count.

    Returns ``(bucket_ids, rows, n_dropped)`` with ``bucket_ids[i]`` in
    ``[0, trash]``, mutually distinct below ``trash``, and ``rows``
    ``(B, 16, 8)`` uint32 images — the bucket_scatter contract.
    """
    lo, hi, bucket, g, match_idx, free_idx, q_rows = probe
    b = lo.shape[0]
    idx = jnp.where(match_idx >= 0, match_idx, free_idx)  # slot-in-bucket
    valid = idx >= 0
    is_new = (match_idx < 0) & valid

    onehot = jax.nn.one_hot(actions, 4, dtype=jnp.float32)
    # Matched rows read their stored Q; fresh claims read zeros (the probe
    # already returns zeros for unmatched rows).
    q_sa = jnp.sum(q_rows * onehot, axis=1)
    td_rows = (
        learning_rate * (targets - q_sa)
    )[:, None] * onehot  # (B, 4) contribution of each entry

    # Group by bucket: stable sort keeps batch order inside a group.
    sort_key = jnp.where(valid, bucket, _BIG)
    order = jnp.argsort(sort_key, stable=True)
    s_bucket = sort_key[order]
    s_valid = valid[order]
    s_new = is_new[order]
    s_idx = jnp.maximum(idx[order], 0)
    s_lo, s_hi = lo[order], hi[order]
    pos = jnp.arange(b, dtype=jnp.int32)
    is_lead = jnp.concatenate(
        [jnp.ones((1,), bool), s_bucket[1:] != s_bucket[:-1]]
    )
    group = jnp.cumsum(is_lead.astype(jnp.int32)) - 1  # (B,) segment ids

    # Claim verification: all of a group's NEW entries share first_free,
    # so the claim winner is the group's lowest-batch-index new entry;
    # kept claimants must share its key.
    claim_pos = jax.ops.segment_min(
        jnp.where(s_new, pos, _BIG), group, num_segments=b
    )
    cp = jnp.clip(claim_pos[group], 0, b - 1)
    key_ok = (s_lo == s_lo[cp]) & (s_hi == s_hi[cp])
    keep = s_valid & (~s_new | key_ok)
    n_dropped = jnp.sum(
        ((~keep & s_valid) | ~s_valid).astype(jnp.int32), axis=0
    )

    # Per-entry image contributions, merged per group.
    slot_oh = jax.nn.one_hot(s_idx, tk.BUCKET, dtype=jnp.float32)  # (B, 16)
    keep_f = keep.astype(jnp.float32)
    q_delta = (
        slot_oh[:, :, None] * td_rows[order][:, None, :] * keep_f[:, None, None]
    )  # (B, 16, 4)
    q_sum = jax.ops.segment_sum(q_delta, group, num_segments=b)
    claim_mask = (keep & s_new).astype(jnp.uint32)[:, None] * slot_oh.astype(
        jnp.uint32
    )  # (B, 16) 1 where this entry claims that slot
    klo_set = jax.ops.segment_max(
        claim_mask * s_lo[:, None], group, num_segments=b
    )
    khi_set = jax.ops.segment_max(
        claim_mask * s_hi[:, None], group, num_segments=b
    )

    base = g[order]  # (B, 16, 8) — identical for all members of a group
    new_klo = jnp.maximum(base[:, :, 0], klo_set)  # claimed slots were 0
    new_khi = jnp.maximum(base[:, :, 1], khi_set)
    new_q = (
        jax.lax.bitcast_convert_type(base[:, :, 2:6], jnp.float32)
        + q_sum[group]
    )
    rows = jnp.concatenate(
        [
            new_klo[:, :, None],
            new_khi[:, :, None],
            jax.lax.bitcast_convert_type(new_q, jnp.uint32),
            jnp.zeros((b, tk.BUCKET, 2), jnp.uint32),
        ],
        axis=2,
    )  # (B, 16, 8)
    write = is_lead & s_valid
    bucket_ids = jnp.where(write, s_bucket, trash)
    return bucket_ids, rows, n_dropped


def fast_update(
    packed: PackedQTable, probe, actions, targets, learning_rate,
    backend: str = "xla",
) -> PackedQTable:
    """Batched Q-update on the packed table (Agent/main.py:40-43).

    ``probe`` is the tuple from :func:`fast_choose_actions_probed` on the
    SAME table and boards (the table does not change between action
    selection and the update, exactly like the legacy probe reuse).
    """
    bucket_ids, rows, n_dropped = resolve_updates(
        probe, actions, targets, learning_rate,
        trash=packed.data.shape[0] - 1,
    )
    data = _scatter(packed, bucket_ids, rows, backend)
    return PackedQTable(data=data, dropped=packed.dropped + n_dropped)


def fast_lookup(packed: PackedQTable, boards, backend: str = "xla"):
    """Batched read: ``(B, 4)`` Q-values, zeros for unseen states."""
    lo, hi = tab.pack_board(boards)
    bucket = tab._hash(lo, hi, packed.capacity // tab.PROBES)
    g = _gather(packed, bucket, backend)
    _, _, q_rows = _probe_gathered(g, lo, hi)
    return q_rows
