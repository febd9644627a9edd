"""Fused Pallas TPU kernel: one entire 2048 env step per kernel launch.

The hot op of the framework. The pure-lax engine (tpu2048.ops.board) emits
hundreds of small XLA ops per env step; this kernel fuses the FULL step —
all four direction merges, legality, (optional random-legal) action
selection, merge-score, tile spawn, game-over check, and auto-reset — into
a single Mosaic kernel using the on-core PRNG, lifting single-chip
throughput from ~2.6M to >100M env-steps/s (see bench.py).

Layout: boards are **cell-major** ``(16, B) int8`` — cell ``r*4+c`` is row
``r*4+c`` — so every element-wise op runs across the batch in the lane
dimension. The four row-merges of all four directions are stacked into one
``(16, BLK)`` computation (16 = 4 directions x 4 rows) to fill sublanes.

Mosaic constraints honored (learned the hard way):
* all in-kernel tensors are >= 2-D (``(1, BLK)`` rows);
* no ``select`` on bool *values* (moved-masks travel as int32);
* compute in int32 (int8 only at the HBM boundary);
* ``BLK`` kept at 1024 — larger blocks spill vector registers and run
  ~10x slower.

Semantics match the "fixed" simple env (tpu2048/env/env.py, reward=SIMPLE,
quirk_compat=False): game-over is evaluated on the post-move post-spawn
board; invalid moves leave the board unchanged and spawn nothing. Spawn
distribution is uniform-over-empties with P(2)=0.9 (Game2048_env.py:16-20);
position/value draws use the per-core PRNG (modulo bias <= 16/2^31,
negligible). RNG streams therefore differ from the jax.random path — the
trajectory-parity harness keeps using the lax env with explicit spawns.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 1024

# Row index tables per direction (0=left, 1=up, 2=right, 3=down —
# Game2048_env.py:54), cells listed from the wall the row slides toward.
ROWS = {
    0: [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11], [12, 13, 14, 15]],
    1: [[0, 4, 8, 12], [1, 5, 9, 13], [2, 6, 10, 14], [3, 7, 11, 15]],
    2: [[3, 2, 1, 0], [7, 6, 5, 4], [11, 10, 9, 8], [15, 14, 13, 12]],
    3: [[12, 8, 4, 0], [13, 9, 5, 1], [14, 10, 6, 2], [15, 11, 7, 3]],
}
# Stacked tables: stack row s = 4*dir + row; LANE[k][s] = board cell of
# lane-position k.
LANE = [[ROWS[d][r][k] for d in range(4) for r in range(4)] for k in range(4)]
# Reassembly: (dir, board cell) -> (stack row, lane position).
REASM = {}
for _d in range(4):
    for _r in range(4):
        for _k, _j in enumerate(ROWS[_d][_r]):
            REASM[(_d, _j)] = (4 * _d + _r, _k)


def _compact(c):
    """Stable zeros-right compaction over 4 lane arrays (sorting network)."""
    c = list(c)
    for i, j in ((0, 1), (1, 2), (2, 3), (0, 1), (1, 2), (0, 1)):
        a, b = c[i], c[j]
        swap = (a == 0) & (b != 0)
        c[i] = jnp.where(swap, b, a)
        c[j] = jnp.where(swap, a, b)
    return c


def _merge_all(cells):
    """All 16 (direction, row) merges at once.

    Args:
      cells: 16 arrays of (1, blk) int32 exponents.

    Returns:
      ``ys``: 4 lane arrays of (16, blk) — merged rows, stacked;
      ``score_d``: 4 arrays (1, blk) int32 — per-direction merge score;
      ``moved_d``: 4 arrays (1, blk) int32 — per-direction validity (0/1).
    """
    stack = [
        jnp.concatenate([cells[i] for i in LANE[k]], axis=0) for k in range(4)
    ]
    x0, x1, x2, x3 = _compact(stack)
    m01 = (x0 == x1) & (x0 > 0)
    m12 = (x1 == x2) & (x1 > 0) & ~m01
    m23 = (x2 == x3) & (x2 > 0) & ~m12
    one = jnp.int32(1)
    zero = jnp.int32(0)
    y0 = x0 + jnp.where(m01, one, zero)
    y1 = jnp.where(m01, zero, x1 + jnp.where(m12, one, zero))
    y2 = jnp.where(m12, zero, x2 + jnp.where(m23, one, zero))
    y3 = jnp.where(m23, zero, x3)
    ys = _compact((y0, y1, y2, y3))
    sc = (
        jnp.where(m01, jnp.left_shift(one, x0 + 1), zero)
        + jnp.where(m12, jnp.left_shift(one, x1 + 1), zero)
        + jnp.where(m23, jnp.left_shift(one, x2 + 1), zero)
    )
    mv = (
        (ys[0] != stack[0])
        | (ys[1] != stack[1])
        | (ys[2] != stack[2])
        | (ys[3] != stack[3])
    ).astype(jnp.int32)
    score_d = [
        sc[4 * d : 4 * d + 1]
        + sc[4 * d + 1 : 4 * d + 2]
        + sc[4 * d + 2 : 4 * d + 3]
        + sc[4 * d + 3 : 4 * d + 4]
        for d in range(4)
    ]
    moved_d = [
        mv[4 * d : 4 * d + 1]
        | mv[4 * d + 1 : 4 * d + 2]
        | mv[4 * d + 2 : 4 * d + 3]
        | mv[4 * d + 3 : 4 * d + 4]
        for d in range(4)
    ]
    return ys, score_d, moved_d


def _legal_dirs(cells):
    """Per-direction legality of a 16-cell board, without a merge network.

    Direction ``d`` is legal iff some row (cells ordered from the wall the
    row slides toward, ROWS[d]) has a hole — a zero nearer the wall than a
    nonzero — or an adjacent equal nonzero pair. ~12 lane ops per row vs
    the ~60 of a full merge; used for the game-over check and the
    ``emit_legal`` output feeding actor-side action masking.

    Returns 4 bool arrays of (1, blk).
    """
    legal = []
    for d in range(4):
        acc = None
        for r in range(4):
            a = [cells[j] for j in ROWS[d][r]]
            nz = [x != 0 for x in a]
            hole = (
                (~nz[0] & (nz[1] | nz[2] | nz[3]))
                | (~nz[1] & (nz[2] | nz[3]))
                | (~nz[2] & nz[3])
            )
            pair = (
                ((a[0] == a[1]) & nz[0])
                | ((a[1] == a[2]) & nz[1])
                | ((a[2] == a[3]) & nz[2])
            )
            row_legal = hole | pair
            acc = row_legal if acc is None else (acc | row_legal)
        legal.append(acc)
    return legal


def _uniform_mod(bits, n):
    """bits (1, blk) uint32 -> int32 in [0, n) (tiny modulo bias)."""
    return (bits >> jnp.uint32(1)).astype(jnp.int32) % jnp.maximum(n, 1)


def _tile_value(bits):
    """Exponent 1 ("2") with p=0.9 else 2 ("4") (Game2048_env.py:20)."""
    return jnp.where(
        (bits % jnp.uint32(10)) < jnp.uint32(9), jnp.int32(1), jnp.int32(2)
    )


def _env_step_core(cells, action, rand, force_done=None,
                   shaped_done: bool = False, stall=None):
    """One env step on 16 (1, blk) int32 cell lanes — the shared core of
    the single-step and multi-step (rollout) kernels.

    Args:
      cells: 16 arrays (1, blk) int32 — the board.
      action: (1, blk) int32; < 0 means "random legal in-kernel".
      rand: callable k -> (1, blk) uint32 — the 8 per-step bit rows.
      force_done: optional (1, blk) bool — lanes terminated regardless of
        the board (the shaped env's >100-consecutive-same-actions stall
        cutoff, Game2048_env.py:123-127). For EXPLICIT action streams the
        counter lives outside the kernel (pure lane arithmetic); for the
        in-kernel random policy pass ``stall`` instead.
      stall: optional ``(consec_action, consec_count, limit)`` — carried
        stall lanes ((1, blk) int32 each; limit a static int). The counter
        advances on the RESOLVED action (which, for random-policy lanes,
        only exists inside this core — the reason the lane moves in-kernel
        for rollouts, VERDICT r4 #8): ``count' = same ? count+1 : 1``,
        and ``count' > limit`` force-terminates the lane (OR-ed into any
        given ``force_done``). The new count is returned; the new
        consec_action is the returned resolved ``action``.
      shaped_done: v1 episode-end semantics (Game2048_env.py:97-129):
        ``done = (~moved & game_over) | force_done`` — a dead board ends
        the episode only on the following (necessarily invalid) move —
        instead of the v2-fixed ``done = game_over``.

    Returns:
      ``(final_cells, new_cells, score, moved, done, mx, second,
      game_over, action)`` where ``final_cells`` is post-auto-reset,
      ``new_cells`` pre-reset, ``moved``/``done``/``game_over`` are bool
      lanes, the rest int32. ``game_over`` (no legal move on the
      post-step board) equals ``done`` unless ``shaped_done``; ``action``
      is the RESOLVED action (the in-kernel random-legal pick for lanes
      that came in < 0).
    """
    ys, score_d, moved_d = _merge_all(cells)
    legal = [m != 0 for m in moved_d]
    n_legal = moved_d[0] + moved_d[1] + moved_d[2] + moved_d[3]

    # Random-legal action for lanes with action < 0 (bench / random policy).
    pick = _uniform_mod(rand(0), n_legal)
    csum = jnp.zeros_like(pick)
    rand_act = jnp.zeros_like(pick)
    for a in range(4):
        hit = legal[a] & (csum == pick)
        rand_act = rand_act + jnp.where(hit, jnp.int32(a), jnp.int32(0))
        csum = csum + moved_d[a]
    action = jnp.where(action < 0, rand_act, action)

    new_count = None
    if stall is not None:
        c_act, c_cnt, limit = stall
        same = action == c_act
        new_count = jnp.where(same, c_cnt + jnp.int32(1), jnp.int32(1))
        fd = new_count > jnp.int32(limit)
        force_done = fd if force_done is None else (force_done | fd)

    oh = [action == a for a in range(4)]
    sel = []
    for j in range(16):
        v = None
        for d in range(4):
            s, k = REASM[(d, j)]
            vj = ys[k][s : s + 1]
            v = vj if v is None else jnp.where(oh[d], vj, v)
        sel.append(v)
    score = jnp.zeros_like(score_d[0])
    moved_i = jnp.zeros_like(moved_d[0])
    for d in range(4):
        score = jnp.where(oh[d], score_d[d], score)
        moved_i = jnp.where(oh[d], moved_d[d], moved_i)
    moved = moved_i != 0

    # Spawn a tile on a uniformly-random empty cell of the merged board.
    empty = [(c == 0) for c in sel]
    n_empty = sum(e.astype(jnp.int32) for e in empty)
    idx = _uniform_mod(rand(2), n_empty)
    val = _tile_value(rand(3))
    csum = jnp.zeros_like(idx)
    spawned = []
    for c, e in zip(sel, empty):
        hit = e & (csum == idx) & moved
        spawned.append(jnp.where(hit, val, c))
        csum = csum + e.astype(jnp.int32)

    # Invalid move: board unchanged (fixed v2 semantics).
    new_cells = [jnp.where(moved, s, c) for s, c in zip(spawned, cells)]

    # Game over on the post-move post-spawn board. A board has a legal
    # move iff it has an empty cell or an adjacent equal nonzero pair
    # (if some row mixes empty and nonzero, L/R moves; otherwise every row
    # is all-full or all-empty, so U/D moves tiles between them) — a ~40-op
    # check instead of a second full _merge_all (~2x kernel speedup).
    has_empty = new_cells[0] == 0
    for c in new_cells[1:]:
        has_empty = has_empty | (c == 0)
    pair = None
    for r in range(4):
        for c in range(3):
            i = 4 * r + c
            h = new_cells[i] == new_cells[i + 1]  # horizontal neighbor
            v = new_cells[c * 4 + r] == new_cells[c * 4 + r + 4]  # vertical
            pair = (h | v) if pair is None else (pair | h | v)
    game_over = ~(has_empty | pair)
    if shaped_done:
        done = (~moved & game_over)
        if force_done is not None:
            done = done | force_done
    else:
        done = game_over

    # Terminal stats (pre-reset): max and second-max exponents — feeds
    # max_number and the driver's terminal bonus (mainDQL:202-213).
    mx = new_cells[0]
    for c in new_cells[1:]:
        mx = jnp.maximum(mx, c)
    second = jnp.zeros_like(mx)
    taken = jnp.zeros_like(mx)  # 1 once the single max slot was skipped
    for c in new_cells:
        is_first_max = (c == mx) & (taken == 0)
        taken = taken + jnp.where(is_first_max, jnp.int32(1), jnp.int32(0))
        second = jnp.where(is_first_max, second, jnp.maximum(second, c))

    # Auto-reset: finished boards become fresh games with two random tiles.
    p1 = _uniform_mod(rand(4), jnp.full_like(mx, 16))
    p2r = _uniform_mod(rand(5), jnp.full_like(mx, 15))
    p2 = jnp.where(p2r >= p1, p2r + 1, p2r)
    v1 = _tile_value(rand(6))
    v2 = _tile_value(rand(7))
    final_cells = []
    for i in range(16):
        fresh = jnp.where(p1 == i, v1, jnp.where(p2 == i, v2, jnp.int32(0)))
        final_cells.append(jnp.where(done, fresh, new_cells[i]))
    return (final_cells, new_cells, score, moved, done, mx, second,
            game_over, action, new_count)


def _step_kernel(
    emit_pre_reset: bool,
    emit_legal: bool,
    use_prng: bool,
    shaped: bool,
    seed_ref,
    boards_ref,
    actions_ref,
    *refs,
):
    refs = list(refs)
    bits_ref = None if use_prng else refs.pop(0)
    force_done_ref = refs.pop(0) if shaped else None
    (out_ref, score_ref, valid_ref, done_ref, max_exp_ref,
     second_exp_ref, *rest) = refs
    game_over_ref = rest.pop(0) if shaped else None
    blk = boards_ref.shape[1]
    if use_prng:
        # Hash-seed from (step seed, block id) so block streams stay
        # distinct across steps (seed+id addition would alias steps).
        # One (8, blk) draw, sliced per use — cheaper than 7 PRNG calls
        # and stream-layout-identical to the external test path.
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        bits = pltpu.prng_random_bits((8, blk))
        rand = lambda k: bits[k : k + 1, :]  # noqa: E731
    else:
        # Test/debug path: 8 externally-supplied uint32 streams per lane.
        rand = lambda k: bits_ref[k : k + 1, :]  # noqa: E731
    cells = [boards_ref[i : i + 1, :].astype(jnp.int32) for i in range(16)]
    action = actions_ref[0:1, :]
    force_done = None
    if shaped:
        force_done = force_done_ref[0:1, :] != 0

    (final_cells, new_cells, score, moved, done, mx, second,
     game_over, _act, _cnt) = _env_step_core(
        cells, action, rand, force_done=force_done, shaped_done=shaped
    )
    for i in range(16):
        out_ref[i : i + 1, :] = final_cells[i].astype(jnp.int8)
        if emit_pre_reset:
            rest[0][i : i + 1, :] = new_cells[i].astype(jnp.int8)

    if emit_legal:
        # Per-direction legality of the POST-reset board — next step's
        # action mask (mainDQL:170-174's probe loop, in-kernel).
        legal_ref = rest[1] if emit_pre_reset else rest[0]
        legal_next = _legal_dirs(final_cells)
        for d in range(4):
            legal_ref[d : d + 1, :] = legal_next[d].astype(jnp.int8)

    score_ref[0:1, :] = score
    valid_ref[0:1, :] = moved.astype(jnp.int8)
    done_ref[0:1, :] = done.astype(jnp.int8)
    max_exp_ref[0:1, :] = mx.astype(jnp.int8)
    second_exp_ref[0:1, :] = second.astype(jnp.int8)
    if shaped:
        game_over_ref[0:1, :] = game_over.astype(jnp.int8)


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "emit_pre_reset", "emit_legal",
                     "interpret"),
)
def fused_env_step(
    boards,
    actions,
    seed,
    rng_bits=None,
    force_done=None,
    *,
    block_size: int = DEFAULT_BLOCK,
    emit_pre_reset: bool = False,
    emit_legal: bool = False,
    interpret: bool = False,
):
    """One fused env step for the whole batch.

    Args:
      boards: ``(16, B)`` int8 cell-major exponent boards.
      actions: ``(B,)`` int32; a value < 0 means "choose a uniformly-random
        legal action in-kernel" (the bench / random-policy mode).
      seed: scalar int32 — vary per step (e.g. a step counter).
      block_size: lane block; 1024 is the tuned value (bigger spills).
      rng_bits: optional ``(8, B)`` uint32 — externally-supplied random
        streams (rows: action-pick, unused, spawn-pos, spawn-val, reset-p1,
        reset-p2, reset-v1, reset-v2). When None (production), the on-core
        TPU PRNG generates them; pass explicit bits for CPU interpret-mode
        tests or deterministic replay.
      emit_pre_reset: also return the post-step board BEFORE auto-reset
        (needed to store terminal transitions in replay).
      emit_legal: also return the per-direction legal-move mask of the
        POST-reset board — the next step's action mask, so the actor never
        recomputes legality outside the kernel.
      force_done: optional ``(B,)`` bool — switches the kernel to the
        SHAPED env's v1 episode-end semantics (``done = (~moved &
        game_over) | force_done``, the stall cutoff lanes computed
        outside; Game2048_env.py:97-129) and appends a ``game_over``
        output right after ``second_exp``. ``None`` = the v2-fixed simple
        semantics (``done = game_over``).

    Returns:
      ``(new_boards, score, valid, done, max_exp, second_exp[, game_over]
      [, pre_reset][, legal_next])`` with shapes ``(16, B)`` int8,
      ``(B,)`` int32, ``(B,)`` bool, ``(B,)`` bool, ``(B,)`` int8,
      ``(B,)`` int8 [, ``(B,)`` bool][, ``(16, B)`` int8][, ``(4, B)``
      int8].
    """
    b = boards.shape[1]
    if b % block_size:
        raise ValueError(f"batch {b} not divisible by block {block_size}")
    shaped = force_done is not None
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    actions2 = actions.reshape(1, b).astype(jnp.int32)

    row = lambda i: (0, i)  # noqa: E731
    board_spec = pl.BlockSpec((16, block_size), row, memory_space=pltpu.VMEM)
    lane_spec = pl.BlockSpec((1, block_size), row, memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((16, b), jnp.int8),
        jax.ShapeDtypeStruct((1, b), jnp.int32),
        jax.ShapeDtypeStruct((1, b), jnp.int8),
        jax.ShapeDtypeStruct((1, b), jnp.int8),
        jax.ShapeDtypeStruct((1, b), jnp.int8),
        jax.ShapeDtypeStruct((1, b), jnp.int8),
    ]
    out_specs = [board_spec, lane_spec, lane_spec, lane_spec, lane_spec,
                 lane_spec]
    if shaped:
        out_shape.append(jax.ShapeDtypeStruct((1, b), jnp.int8))
        out_specs.append(lane_spec)
    if emit_pre_reset:
        out_shape.append(jax.ShapeDtypeStruct((16, b), jnp.int8))
        out_specs.append(board_spec)
    if emit_legal:
        out_shape.append(jax.ShapeDtypeStruct((4, b), jnp.int8))
        out_specs.append(
            pl.BlockSpec((4, block_size), row, memory_space=pltpu.VMEM)
        )

    use_prng = rng_bits is None
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        board_spec,
        lane_spec,
    ]
    inputs = [seed_arr, boards, actions2]
    if not use_prng:
        in_specs.append(
            pl.BlockSpec((8, block_size), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(rng_bits)
    if shaped:
        in_specs.append(lane_spec)
        inputs.append(force_done.reshape(1, b).astype(jnp.int8))

    outs = pl.pallas_call(
        functools.partial(_step_kernel, emit_pre_reset, emit_legal, use_prng,
                          shaped),
        grid=(b // block_size,),
        in_specs=in_specs,
        out_shape=tuple(out_shape),
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(*inputs)

    new_boards, score, valid, done, max_exp, second_exp = outs[:6]
    result = (
        new_boards,
        score[0],
        valid[0] != 0,
        done[0] != 0,
        max_exp[0],
        second_exp[0],
    )
    k = 6
    if shaped:
        result = result + (outs[k][0] != 0,)
        k += 1
    if emit_pre_reset:
        result = result + (outs[k],)
        k += 1
    if emit_legal:
        result = result + (outs[k],)
    return result


def _rollout_kernel(
    k_steps: int,
    use_prng: bool,
    terminal_bonus: bool,
    latch: bool,
    shaped: bool,
    stall_limit: int,
    reset_shaping: bool,
    seed_ref,
    boards_ref,
    score_ref,
    steps_ref,
    ret_ref,
    *refs,
):
    refs = list(refs)
    bits_ref = None if use_prng else refs.pop(0)
    if shaped:
        cact_ref = refs.pop(0)
        ccnt_ref = refs.pop(0)
    if latch:
        (latched_ref, fscore_ref, fsteps_ref, fmax_ref,
         acnt_ref) = refs[:5]
        refs = refs[5:]
    (out_ref, oscore_ref, osteps_ref, oret_ref, rsum_ref,
     dcnt_ref, *orest) = refs
    if shaped:
        ocact_ref = orest.pop(0)
        occnt_ref = orest.pop(0)
    if latch:
        (olatched_ref, ofscore_ref, ofsteps_ref, ofmax_ref,
         oacnt_ref) = orest
    blk = boards_ref.shape[1]
    if use_prng:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    cells = [boards_ref[i : i + 1, :].astype(jnp.int32) for i in range(16)]
    ep_score = score_ref[0:1, :]
    ep_steps = steps_ref[0:1, :]
    ep_ret = ret_ref[0:1, :]
    action = jnp.full((1, blk), -1, jnp.int32)  # random-legal every step
    rsum = jnp.zeros((1, blk), jnp.int32)
    dcnt = jnp.zeros((1, blk), jnp.int32)
    if shaped:
        # Stall lanes (Game2048_env.py:110-127), carried in VMEM across
        # the window: the counter advances on the RESOLVED random action
        # inside _env_step_core (VERDICT r4 #8 — the reason shaped random
        # rollouts previously had to step the single-step path).
        c_act = cact_ref[0:1, :]
        c_cnt = ccnt_ref[0:1, :]
    if latch:
        # First-completion latches (the eval harness' per-lane stats) and
        # live-step action counts, carried in VMEM across the window.
        latched = latched_ref[0:1, :].astype(jnp.int32)
        fscore = fscore_ref[0:1, :]
        fsteps = fsteps_ref[0:1, :]
        fmax = fmax_ref[0:1, :].astype(jnp.int32)
        acnt = [acnt_ref[a : a + 1, :] for a in range(4)]

    for it in range(k_steps):
        if use_prng:
            bits = pltpu.prng_random_bits((8, blk))
            rand = lambda k, b=bits: b[k : k + 1, :]  # noqa: E731
        else:
            rand = (  # noqa: E731
                lambda k, o=8 * it: bits_ref[o + k : o + k + 1, :]
            )
        (cells, _, score, moved, done, mx, second, _go, act,
         new_cnt) = _env_step_core(
            cells, action, rand,
            shaped_done=shaped,
            stall=(c_act, c_cnt, stall_limit) if shaped else None,
        )
        if shaped:
            # Post-step lane carry, exactly _shaped_fast_step's: the new
            # consec action is the resolved action; lanes persist across
            # auto-resets (Game2048_env.py:187-191) unless reset_shaping.
            c_act, c_cnt = act, new_cnt
            if reset_shaping:
                c_act = jnp.where(done, jnp.int32(-1), c_act)
                c_cnt = jnp.where(done, jnp.int32(0), c_cnt)
            # Shaped rewards (log/pow float shaping + the stall penalty
            # ladder) are host-side lane math by design — the kernel and
            # the classic env share tpu2048.env.rewards so formulas cannot
            # drift. A shaped window therefore maintains no reward sums:
            # the rollout's consumers (random eval latches, done counts,
            # board evolution) are reward-free.
            reward = jnp.zeros_like(score)
        else:
            # Simple reward (nopenalty:122-138) + optional terminal bonus
            # (mainDQL:202-213) — integer-valued, accumulated exactly.
            reward = jnp.where(~moved & ~done, jnp.int32(-10), score)
            if terminal_bonus:
                bonus = jnp.where(
                    mx >= 11,
                    jnp.int32(100),
                    jnp.where((mx >= 10) & (second >= 10), jnp.int32(50),
                              jnp.int32(0)),
                )
                reward = reward + jnp.where(done, bonus, jnp.int32(0))
            rsum = rsum + reward
        dcnt = dcnt + done.astype(jnp.int32)
        if latch:
            live = latched == 0
            newly = live & done
            one = jnp.int32(1)
            zero = jnp.int32(0)
            fscore = jnp.where(newly, ep_score + score, fscore)
            fsteps = jnp.where(newly, ep_steps + one, fsteps)
            fmax = jnp.where(newly, mx, fmax)
            for a in range(4):
                acnt[a] = acnt[a] + jnp.where(
                    live & (act == a), one, zero
                )
            latched = jnp.where(newly, one, latched)
        new_score = ep_score + score
        new_steps = ep_steps + jnp.int32(1)
        new_ret = ep_ret + reward.astype(jnp.float32)
        zero = jnp.int32(0)
        ep_score = jnp.where(done, zero, new_score)
        ep_steps = jnp.where(done, zero, new_steps)
        ep_ret = jnp.where(done, jnp.float32(0.0), new_ret)

    for i in range(16):
        out_ref[i : i + 1, :] = cells[i].astype(jnp.int8)
    oscore_ref[0:1, :] = ep_score
    osteps_ref[0:1, :] = ep_steps
    oret_ref[0:1, :] = ep_ret
    rsum_ref[0:1, :] = rsum
    dcnt_ref[0:1, :] = dcnt
    if shaped:
        ocact_ref[0:1, :] = c_act
        occnt_ref[0:1, :] = c_cnt
    if latch:
        olatched_ref[0:1, :] = latched.astype(jnp.int8)
        ofscore_ref[0:1, :] = fscore
        ofsteps_ref[0:1, :] = fsteps
        ofmax_ref[0:1, :] = fmax.astype(jnp.int8)
        for a in range(4):
            oacnt_ref[a : a + 1, :] = acnt[a]


@functools.partial(
    jax.jit,
    static_argnames=("k_steps", "block_size", "terminal_bonus", "interpret",
                     "stall_limit", "reset_shaping"),
)
def fused_env_rollout(
    boards,
    score,
    steps,
    episode_return,
    seed,
    k_steps: int,
    rng_bits=None,
    latch_state=None,
    stall_state=None,
    *,
    terminal_bonus: bool = True,
    stall_limit: int = 100,
    reset_shaping: bool = False,
    block_size: int = DEFAULT_BLOCK,
    interpret: bool = False,
):
    """``k_steps`` random-policy env steps in ONE kernel launch.

    The multi-step variant of :func:`fused_env_step` for the
    random-legal-policy regime (bench rollouts, replay burn-in, random
    eval): the board and the episode accounting stay resident in VMEM
    across all ``k_steps`` inner steps, so per-launch overhead and the
    per-step HBM round-trip are amortized ``k_steps``-fold. Per-step
    rewards are not materialized; the kernel accumulates their sum and
    the number of completed episodes per lane (all rewards are
    integer-valued — the accumulation is exact).

    Args:
      boards: ``(16, B)`` int8 cell-major exponent boards.
      score / steps: ``(B,)`` int32 per-episode merge score / step count.
      episode_return: ``(B,)`` f32 per-episode reward sum.
      seed: scalar int32 — vary per launch.
      k_steps: number of fused env steps per launch (static).
      rng_bits: optional ``(8 * k_steps, B)`` uint32 — externally-supplied
        bit rows, 8 per inner step in :func:`fused_env_step` row order
        (interpret-mode tests / deterministic replay). None = on-core PRNG.
      latch_state: optional ``(latched, fscore, fsteps, fmax, acnt)`` —
        per-lane first-completion latches (``(B,)`` int8/int32/int32/int8
        and ``(4, B)`` int32 live-action counts). When given, the kernel
        updates them in VMEM across the window (the eval harness'
        latch-first-completion logic, in-kernel) and returns the new
        tuple appended to the outputs.
      stall_state: optional ``(consec_action, consec_count)`` ``(B,)``
        int32 lanes — enables SHAPED mode (QLearningBase semantics): the
        anti-stall counter advances in-kernel on the resolved random
        action (Game2048_env.py:110-127), ``count > stall_limit`` force-
        terminates the lane, and the v1 done rule applies
        (``done = (~moved & game_over) | force_done``). Shaped windows
        maintain NO reward lanes (``reward_sum`` stays 0 and
        ``episode_return`` only resets on done): shaped rewards are
        host-side float shaping (tpu2048.env.rewards) shared with the
        classic env, and the rollout's consumers — random-eval latches,
        done counts, board evolution — are reward-free. The updated
        stall lanes are appended to the outputs (after any latch tuple).
      terminal_bonus: include the driver's terminal bonus
        (mainDQL:202-213) in the reward, as
        :func:`tpu2048.env.fast.fast_step` does (simple mode only).
      stall_limit / reset_shaping: shaped-mode statics — the force-done
        cutoff (Game2048_env.py:123) and whether shaping lanes clear on
        auto-reset (EnvConfig.reset_shaping_on_reset; the reference
        faithfully persists them, Game2048_env.py:187-191).

    Returns:
      ``(new_boards, new_score, new_steps, new_episode_return,
      reward_sum, done_count[, latch_state'][, stall_state'])`` — the
      first four are the carried state after ``k_steps`` steps (episode
      fields reset on each done, exactly as ``fast_step`` maintains
      them); ``reward_sum`` ``(B,)`` int32 and ``done_count`` ``(B,)``
      int32 are per-lane totals over the window.
    """
    b = boards.shape[1]
    if b % block_size:
        raise ValueError(f"batch {b} not divisible by block {block_size}")
    latch = latch_state is not None
    shaped = stall_state is not None
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    row = lambda i: (0, i)  # noqa: E731
    board_spec = pl.BlockSpec((16, block_size), row, memory_space=pltpu.VMEM)
    lane_spec = pl.BlockSpec((1, block_size), row, memory_space=pltpu.VMEM)
    quad_spec = pl.BlockSpec((4, block_size), row, memory_space=pltpu.VMEM)

    use_prng = rng_bits is None
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        board_spec,
        lane_spec,
        lane_spec,
        lane_spec,
    ]
    inputs = [
        seed_arr,
        boards,
        score.reshape(1, b),
        steps.reshape(1, b),
        episode_return.reshape(1, b),
    ]
    if not use_prng:
        in_specs.append(
            pl.BlockSpec((8 * k_steps, block_size), row,
                         memory_space=pltpu.VMEM)
        )
        inputs.append(rng_bits)
    if shaped:
        c_act, c_cnt = stall_state
        in_specs += [lane_spec, lane_spec]
        inputs += [c_act.reshape(1, b), c_cnt.reshape(1, b)]
    if latch:
        latched, fscore, fsteps, fmax, acnt = latch_state
        in_specs += [lane_spec, lane_spec, lane_spec, lane_spec, quad_spec]
        inputs += [
            latched.reshape(1, b).astype(jnp.int8),
            fscore.reshape(1, b),
            fsteps.reshape(1, b),
            fmax.reshape(1, b).astype(jnp.int8),
            acnt,
        ]

    out_shape = [
        jax.ShapeDtypeStruct((16, b), jnp.int8),
        jax.ShapeDtypeStruct((1, b), jnp.int32),
        jax.ShapeDtypeStruct((1, b), jnp.int32),
        jax.ShapeDtypeStruct((1, b), jnp.float32),
        jax.ShapeDtypeStruct((1, b), jnp.int32),
        jax.ShapeDtypeStruct((1, b), jnp.int32),
    ]
    out_specs = [board_spec, lane_spec, lane_spec, lane_spec, lane_spec,
                 lane_spec]
    if shaped:
        out_shape += [
            jax.ShapeDtypeStruct((1, b), jnp.int32),
            jax.ShapeDtypeStruct((1, b), jnp.int32),
        ]
        out_specs += [lane_spec, lane_spec]
    if latch:
        out_shape += [
            jax.ShapeDtypeStruct((1, b), jnp.int8),
            jax.ShapeDtypeStruct((1, b), jnp.int32),
            jax.ShapeDtypeStruct((1, b), jnp.int32),
            jax.ShapeDtypeStruct((1, b), jnp.int8),
            jax.ShapeDtypeStruct((4, b), jnp.int32),
        ]
        out_specs += [lane_spec, lane_spec, lane_spec, lane_spec, quad_spec]
    outs = pl.pallas_call(
        functools.partial(
            _rollout_kernel, k_steps, use_prng, terminal_bonus, latch,
            shaped, stall_limit, reset_shaping,
        ),
        grid=(b // block_size,),
        in_specs=in_specs,
        out_shape=tuple(out_shape),
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(*inputs)
    new_boards, oscore, osteps, oret, rsum, dcnt = outs[:6]
    head = (new_boards, oscore[0], osteps[0], oret[0], rsum[0], dcnt[0])
    rest = list(outs[6:])
    if shaped:
        oca, occ = rest[:2]
        rest = rest[2:]
    if latch:
        ol, ofs, ofst, ofm, oac = rest
        head = head + ((ol[0], ofs[0], ofst[0], ofm[0], oac),)
    if shaped:
        head = head + ((oca[0], occ[0]),)
    return head


def to_cell_major(boards):
    """``(B, 4, 4)`` -> ``(16, B)`` int8."""
    b = boards.shape[0]
    return boards.reshape(b, 16).T


def from_cell_major(boards_cm):
    """``(16, B)`` -> ``(B, 4, 4)`` int8."""
    return boards_cm.T.reshape(-1, 4, 4)
