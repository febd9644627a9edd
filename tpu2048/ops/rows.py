"""Core 2048 row kernels — branch-free, batched, TPU-first.

Re-implements the semantics of the reference engine's ``move_left``
(/root/reference/QLearningBase/environment/Game2048_env.py:22-46 and
/root/reference/Deep_QLearning/environment/Game2048_nopenalty_env.py:23-48):
slide non-zero tiles left, merge equal adjacent tiles left-to-right with the
single-merge-per-pass rule (the reference's ``skip`` flag), and report the
merge score and whether the row changed.

Design (TPU-first, not a translation):

* Tiles are stored as **log2 exponents** in ``int8`` (0 = empty, 1 = "2",
  ..., 11 = "2048", up to 15 = "32768" to match the reference's 16-channel
  one-hot encoding, Dqn8TestNOPERCNN.py:274).
* A row is 4 lanes of a ``(..., 4)`` array. All operations below are pure
  element-wise/select ops over the batch dimensions, so XLA fuses the whole
  slide+merge into a single VPU kernel with no gathers, no scatters, no
  data-dependent control flow — ``vmap``/``jit`` friendly by construction.
* The slide is a 6-comparator stable sorting network (bubble network for
  n=4) that moves zeros right while preserving non-zero order.
* The merge is the closed form of the reference's left-to-right skip scan:
  ``m01``, then ``m12`` only if ``m01`` didn't fire, then ``m23`` only if
  ``m12`` didn't fire.
"""

from __future__ import annotations

import jax.numpy as jnp

# Maximum exponent representable (2**15 = 32768); matches the 16-channel
# one-hot state encoding of the reference (Dqn8TestNOPERCNN.py:274).
MAX_EXPONENT = 15

_BUBBLE_PAIRS = ((0, 1), (1, 2), (2, 3), (0, 1), (1, 2), (0, 1))


def _unstack4(rows):
    """Split a (..., 4) array into four (...,) lane arrays."""
    return rows[..., 0], rows[..., 1], rows[..., 2], rows[..., 3]


def _compact_left(cells):
    """Stable-compact zeros to the right over a 4-tuple of lane arrays.

    Implements the slide part of the reference's ``move_left`` (the
    ``row[row != 0]`` compaction, Game2048_env.py:26) as a sorting network.
    """
    cells = list(cells)
    for i, j in _BUBBLE_PAIRS:
        a, b = cells[i], cells[j]
        swap = (a == 0) & (b != 0)
        cells[i] = jnp.where(swap, b, a)
        cells[j] = jnp.where(swap, a, b)
    return tuple(cells)


def merge_rows_left(rows):
    """Slide+merge rows to the left.

    Args:
      rows: ``(..., 4)`` int8 array of tile exponents (0 = empty).

    Returns:
      ``(new_rows, score, moved)`` where ``new_rows`` is ``(..., 4)`` int8,
      ``score`` is ``(...,)`` int32 (sum of created tile values, i.e.
      ``2**(e+1)`` per merge — the reference's ``score += non_zero[i] * 2``,
      Game2048_env.py:36), and ``moved`` is ``(...,)`` bool (row changed).
    """
    rows = rows.astype(jnp.int8)
    x0, x1, x2, x3 = _compact_left(_unstack4(rows))

    # Left-to-right merge scan with the reference's skip rule
    # (Game2048_env.py:29-40): a cell consumed by a merge cannot merge again.
    m01 = (x0 == x1) & (x0 > 0)
    m12 = (x1 == x2) & (x1 > 0) & ~m01
    m23 = (x2 == x3) & (x2 > 0) & ~m12

    one = jnp.int8(1)
    zero = jnp.int8(0)
    y0 = x0 + jnp.where(m01, one, zero)
    y1 = jnp.where(m01, zero, x1 + jnp.where(m12, one, zero))
    y2 = jnp.where(m12, zero, x2 + jnp.where(m23, one, zero))
    y3 = jnp.where(m23, zero, x3)

    # Merges punch holes; compact once more. (y0 is never a new hole.)
    y0, y1, y2, y3 = _compact_left((y0, y1, y2, y3))
    new_rows = jnp.stack([y0, y1, y2, y3], axis=-1)

    # Score: each merge of exponent e creates tile 2**(e+1).
    def _val(mask, exp):
        e = exp.astype(jnp.int32) + 1
        return jnp.where(mask, jnp.left_shift(jnp.int32(1), e), 0)

    score = _val(m01, x0) + _val(m12, x1) + _val(m23, x2)

    # A merge strictly changes the row's multiset, so "row changed" covers
    # both the reference's moved conditions (Game2048_env.py:38,42-43).
    moved = jnp.any(new_rows != rows, axis=-1)
    return new_rows, score, moved
