"""Pallas TPU kernels for the hashed Q-table: bucket gather + bucket scatter.

Why these exist (docs/DESIGN.md §5b³, measured on the real chip in r4):
XLA lowers gathers/scatters against the 0.1-1 GB Q-table arrays to an
effectively serialized per-row loop costing ~0.36 us per row *independent
of table size*, and the tabular train step issues ~10 such ops — ~4 ms per
step at batch 1024 (251k env-steps/s), with the table >95% of the step.
Interleaving key words to cut the op count hit a pathological relayout and
measured 10x WORSE (§5b³'s negative result). The design conclusion was
that only explicit per-bucket DMA bypasses XLA's per-row serialization;
these kernels are that path.

Layout: one BUCKET = one 128-lane uint32 row. The packed table is
``(n_buckets + 1, 128)``: row ``b`` holds bucket ``b``'s 16 slots
slot-major — slot ``j`` occupies words ``[8j, 8j+8)`` as ``[key_lo,
key_hi, q0..q3 (f32 bitcast), pad, pad]``. This makes every DMA exactly
one aligned (1, 128) row slice of HBM — Mosaic requires HBM slices to be
128-lane aligned in the minor dimension, which is also why updates write
whole 512 B bucket images (rebuilt from the already-gathered base) rather
than 32 B slot rows: callers pre-merge all of a bucket's slot updates
into one image (agents/tabular_fast.resolve_updates), which additionally
collapses same-bucket updates into ONE write. Row ``n_buckets`` is a
write-only TRASH row: entries with nothing to write (dropped updates,
non-leaders of a merged bucket group) are directed there so the scatter
runs with a static shape and no in-kernel branching.

Kernels (both: scalar-prefetched indices, manual ``make_async_copy`` ring
of ``DMA_RING`` in-flight copies, grid = 1):

* :func:`bucket_gather` — ``out[i] = data[bucket[i]]``; the probe read of
  the train step (action select, target lookup).
* :func:`bucket_scatter` — ``data[idx[i]] = rows[i]`` for pre-merged
  DISTINCT bucket images; in-place via input_output_aliases.

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
#: uint32 words per slot: [key_lo, key_hi, q0..q3, pad, pad].
WIDTH = 8
#: uint32 words per bucket row — exactly one 128-lane vector register /
#: one aligned HBM tile row.
ROW = BUCKET * WIDTH
#: In-flight DMA copies. Deep enough to hide HBM latency (~1 us) behind
#: the per-iteration issue cost; a deeper ring buys nothing once issue
#: becomes the bottleneck.
DMA_RING = 8


def _gather_kernel(idx_ref, data_ref, out_ref, sems):
    """out[i] <- data[idx[i]] ((1, 128) row copies, DMA ring)."""
    b = out_ref.shape[0]
    ring = min(DMA_RING, b)

    def copy(i):
        return pltpu.make_async_copy(
            data_ref.at[pl.ds(idx_ref[i], 1), :],
            out_ref.at[pl.ds(i, 1), :],
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
    """Gather B bucket rows: ``(NB+1, 128) u32, (B,) i32 -> (B, 16, 8)``."""
    b = buckets.shape[0]
    out = pl.pallas_call(
        _gather_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((min(DMA_RING, b),))],
        ),
        out_shape=jax.ShapeDtypeStruct((b, ROW), jnp.uint32),
        interpret=interpret,
    )(buckets, data)
    return out.reshape(b, BUCKET, WIDTH)


def _scatter_kernel(idx_ref, data_ref, rows_ref, out_ref, sems):
    """data[idx[i]] <- rows[i] ((1, 128) row writes, DMA ring).

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
def bucket_scatter(data: jax.Array, buckets: jax.Array, rows: jax.Array,
                   interpret: bool = False) -> jax.Array:
    """Write B bucket images in place: ``data[buckets[i]] = rows[i]``.

    ``buckets`` must be mutually distinct except for the trash row
    ``n_buckets`` (where last-write-wins is fine because the row is never
    read); callers pre-merge same-bucket updates into one image
    (agents/tabular_fast.resolve_updates). ``rows`` is ``(B, 16, 8)`` or
    ``(B, 128)`` uint32.
    """
    rows = rows.reshape(rows.shape[0], ROW)
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
    )(buckets, data, rows)


# ---------------------------------------------------------------------------
# Pure-jnp twins: identical semantics, run anywhere. The differential
# oracle for the kernels and the CPU fallback for the packed train path.
# ---------------------------------------------------------------------------

def bucket_gather_xla(data: jax.Array, buckets: jax.Array) -> jax.Array:
    nb = data.shape[0] - 1
    return data[:nb][buckets].reshape(buckets.shape[0], BUCKET, WIDTH)


def bucket_scatter_xla(data: jax.Array, buckets: jax.Array,
                       rows: jax.Array) -> jax.Array:
    # Distinct real buckets by contract; trash-row duplicates may land in
    # any order (the row is never read), matching the kernel's in-flight
    # DMA nondeterminism there.
    return data.at[buckets].set(rows.reshape(rows.shape[0], ROW))
