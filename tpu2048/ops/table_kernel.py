"""Pallas TPU kernels for the hashed Q-table: bucket gather + slot scatter.

Why these exist (docs/DESIGN.md §5b³, measured on the real chip in r4):
XLA lowers gathers/scatters against the 0.1-1 GB Q-table arrays to an
effectively serialized per-row loop costing ~0.36 us per row *independent
of table size*, and the tabular train step issues ~10 such ops — ~4 ms per
step at batch 1024 (251k env-steps/s), with the table >95% of the step.
Interleaving key words to cut the op count hit a pathological relayout and
measured 10x WORSE (§5b³'s negative result). The design conclusion was
that only explicit per-bucket DMA bypasses XLA's per-row serialization;
these kernels are that path.

Layout: the packed table is ONE slot-major uint32 array ``(S + 1, 8)`` —
row ``s`` = ``[key_lo, key_hi, q0..q3 (f32 bitcast), pad, pad]`` — so a
16-slot bucket is one contiguous 512 B block ``rows [16b, 16b+16)`` and a
single slot update (claimed key + its whole Q-row) is one contiguous 32 B
row write. Row ``S`` is a write-only TRASH row: entries with nothing to
write (dropped updates, non-leaders of a deduplicated group) are directed
there so the scatter runs with a static shape and no in-kernel branching.

Kernels (both: scalar-prefetched indices, manual ``make_async_copy`` ring
of ``DMA_RING`` in-flight copies, grid = 1):

* :func:`bucket_gather` — ``out[i] = data[16*bucket[i] : 16*bucket[i]+16]``
  for B buckets; the probe read of the train step (select, target lookup).
* :func:`slot_scatter` — ``data[slot[i]] = rows[i]`` for B pre-resolved
  DISTINCT slot rows (callers deduplicate same-slot updates first — see
  agents/tabular_fast.resolve_updates); in-place via input_output_aliases.

Both have a pure-jnp twin (``*_xla``) with identical semantics — the
differential oracle for interpret-mode tests and the CPU fallback.

Reference behavior being accelerated: the tabular agent's entire hot loop
(/root/reference/QLearningBase/Agent/main.py:91-99 — dict lookup, argmax,
Q-update per step, serial).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: Slots per bucket — must match agents.tabular.PROBES (asserted there).
BUCKET = 16
#: uint32 words per slot row: [key_lo, key_hi, q0..q3, pad, pad].
WIDTH = 8
#: In-flight DMA copies. Deep enough to hide HBM latency (~1 us) behind
#: the per-iteration issue cost; a deeper ring buys nothing once issue
#: becomes the bottleneck.
DMA_RING = 8


def _gather_kernel(idx_ref, data_ref, out_ref, sems):
    """out[i] <- data[16*idx[i] : 16*idx[i]+16] with a DMA ring."""
    b = out_ref.shape[0]
    ring = min(DMA_RING, b)

    def copy(i):
        row = idx_ref[i] * BUCKET
        return pltpu.make_async_copy(
            data_ref.at[pl.ds(row, BUCKET), :],
            out_ref.at[i],
            sems.at[jax.lax.rem(i, ring)],
        )

    for k in range(ring):  # prologue: fill the ring (static unroll)
        copy(k).start()

    def body(i, _):
        copy(i).wait()

        @pl.when(i + ring < b)
        def _():
            copy(i + ring).start()

        return _

    jax.lax.fori_loop(0, b, body, None)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bucket_gather(data: jax.Array, buckets: jax.Array,
                  interpret: bool = False) -> jax.Array:
    """Gather B bucket blocks: ``(S+1, 8) u32, (B,) i32 -> (B, 16, 8)``."""
    b = buckets.shape[0]
    return pl.pallas_call(
        _gather_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((min(DMA_RING, b),))],
        ),
        out_shape=jax.ShapeDtypeStruct((b, BUCKET, WIDTH), jnp.uint32),
        interpret=interpret,
    )(buckets, data)


def _scatter_kernel(idx_ref, data_ref, rows_ref, out_ref, sems):
    """data[idx[i]] <- rows[i] (32 B row writes, DMA ring).

    ``data_ref`` is aliased to ``out_ref`` (in-place); every copy writes
    into ``out_ref`` so untouched rows keep their input contents.
    """
    b = rows_ref.shape[0]
    ring = min(DMA_RING, b)

    def copy(i):
        return pltpu.make_async_copy(
            rows_ref.at[pl.ds(i, 1), :],
            out_ref.at[pl.ds(idx_ref[i], 1), :],
            sems.at[jax.lax.rem(i, ring)],
        )

    for k in range(ring):
        copy(k).start()

    def body(i, _):
        copy(i).wait()

        @pl.when(i + ring < b)
        def _():
            copy(i + ring).start()

        return _

    jax.lax.fori_loop(0, b, body, None)


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=0)
def slot_scatter(data: jax.Array, slots: jax.Array, rows: jax.Array,
                 interpret: bool = False) -> jax.Array:
    """Write B slot rows in place: ``data[slots[i]] = rows[i]``.

    ``slots`` must be mutually distinct except for the trash row ``S``
    (where last-write-wins is fine because the row is never read); callers
    pre-deduplicate real slots (agents/tabular_fast.resolve_updates).
    """
    return pl.pallas_call(
        _scatter_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.SemaphoreType.DMA((min(DMA_RING, rows.shape[0]),))
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(data.shape, data.dtype),
        input_output_aliases={1: 0},  # data (after the 1 scalar arg) -> out
        interpret=interpret,
    )(slots, data, rows)


# ---------------------------------------------------------------------------
# Pure-jnp twins: identical semantics, run anywhere. The differential
# oracle for the kernels and the CPU fallback for the packed train path.
# ---------------------------------------------------------------------------

def bucket_gather_xla(data: jax.Array, buckets: jax.Array) -> jax.Array:
    s = data.shape[0] - 1
    return data[:s].reshape(s // BUCKET, BUCKET, WIDTH)[buckets]


def slot_scatter_xla(data: jax.Array, slots: jax.Array,
                     rows: jax.Array) -> jax.Array:
    # Distinct real slots by contract; trash-row duplicates may land in any
    # order (the row is never read), matching the kernel's in-flight DMA
    # nondeterminism there.
    return data.at[slots].set(rows)
