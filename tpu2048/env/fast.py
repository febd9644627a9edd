"""Fast batched env backed by the fused Pallas step kernel.

Speed-of-light path for the simple-reward environment
(Game2048_nopenalty_env.py semantics, fixed variant): board state lives
cell-major ``(16, B)`` in HBM and the whole step (merge/legality/spawn/
game-over/auto-reset, optional in-kernel random-legal policy) is one
kernel launch — >100M env-steps/s on a single v5e chip vs ~2.6M for the
op-by-op lax env (bench.py). Reward (simple + optional terminal bonus,
mainDQL:202-213) and episode accounting are a handful of fused lane ops
outside the kernel.

This is the DEFAULT engine of the DQN/tabular training loops and the eval
harness for SIMPLE-reward fixed semantics (the hot loop the reference
spends its life in, mainDQL_CNN_step2.py:160-237). The classic
:mod:`tpu2048.env.env` remains the reference-parity path (shaped rewards,
quirk-compat, explicit-spawn replay).

Two interchangeable backends compute the identical step function:

* ``backend="pallas"`` — the fused Mosaic kernel
  (:func:`tpu2048.ops.pallas_step.fused_env_step`); production.
* ``backend="lax"`` — :func:`lax_fast_step`, the same semantics written
  op-by-op on :mod:`tpu2048.ops.board`. Requires ``external_rng`` (it
  consumes the same explicit bit streams the kernel does), and is the
  differential oracle: with the same bits, both backends produce
  bit-identical trajectories (tests/test_pallas_step.py,
  tests/test_fast_training.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from tpu2048.ops import board as board_ops
from tpu2048.ops import pallas_step as ps


@dataclasses.dataclass(frozen=True)
class FastEnvConfig:
    terminal_bonus: bool = True
    block_size: int = ps.DEFAULT_BLOCK
    interpret: bool = False  # pallas interpret mode (CPU tests)
    external_rng: bool = False  # feed jax.random bits instead of TPU PRNG
    # (required for interpret mode — the interpreter has no core PRNG)
    backend: str = "pallas"  # "pallas" (fused kernel) or "lax" (oracle)
    # SHAPED-reward mode (QLearningBase, Game2048_env.py:78-205): the
    # kernel runs v1 done semantics + stall force-done, and the shaped
    # reward/stall-penalty/prev-max lanes are fused elementwise ops
    # outside the kernel (identical code to the classic env's —
    # tpu2048.env.rewards — so the formulas cannot drift apart).
    shaped: bool = False
    max_consecutive_actions: int = 10  # Game2048_env.py:92
    stall_force_done: int = 100  # Game2048_env.py:123
    reset_shaping: bool = False  # EnvConfig.reset_shaping_on_reset

    def __post_init__(self):
        if self.backend not in ("pallas", "lax"):
            raise ValueError(f"unknown fast-env backend {self.backend!r}")
        if self.backend == "lax" and not self.external_rng:
            raise ValueError("backend='lax' requires external_rng=True")


def resolve_engine(env_config, engine: str,
                   require_auto_reset: bool = True) -> str:
    """THE fast-engine eligibility rule, shared by every driver.

    The fused kernel implements the simple-reward (nopenalty:122-138) and
    shaped-reward (Game2048_env.py:136-205, incl. v1 done semantics and
    the stall machinery) non-quirk, auto-resetting semantics; quirk-compat
    and explicit-spawn parity replay need the op-by-op lax env.
    ``require_auto_reset=False`` is for the eval harness, which latches
    each board's first completion and so tolerates (ignores) the kernel's
    free auto-restarts.

    "auto" picks "fast" when eligible; an explicit "fast" on an
    ineligible env raises.
    """
    from tpu2048.env.env import SHAPED, SIMPLE  # local import: no cycle

    fast_ok = (
        env_config.reward in (SIMPLE, SHAPED)
        and not env_config.quirk_compat
        and (env_config.auto_reset or not require_auto_reset)
    )
    if engine == "auto":
        return "fast" if fast_ok else "lax"
    if engine == "fast" and not fast_ok:
        raise ValueError(
            "engine='fast' requires non-quirk"
            + (", auto-reset" if require_auto_reset else "")
            + f" env semantics (got {env_config})"
        )
    if engine not in ("fast", "lax"):
        raise ValueError(f"unknown engine {engine!r}")
    return engine


def fit_block(batch: int, block: int) -> int:
    """Largest divisor of ``batch`` that is <= ``block`` (the kernel
    requires batch % block == 0).

    Warns on degenerate results: a batch whose largest divisor <= block
    is tiny (e.g. a prime env count) silently under-fills the 1024-wide
    vector lanes — the mirror image of the large-block vreg-spill cliff
    (ops/pallas_step.py) — so below 128 lanes the kernel runs far off its
    throughput envelope.
    """
    requested = block
    block = max(min(block, batch), 1)
    while batch % block:
        block -= 1
    # Only warn when the divisor search actually REDUCED the block below
    # what was asked for: an explicit small block (or a batch smaller than
    # 128) is a deliberate configuration, not a degenerate prime batch.
    if block < min(128, batch, requested):
        import warnings

        warnings.warn(
            f"fit_block({batch}, ...) resolved to a degenerate kernel "
            f"block of {block} lanes (<128): the batch has no larger "
            f"divisor under the block cap, so the fused kernel will "
            f"under-fill its vector lanes. Prefer an env count that is a "
            f"multiple of 128 (ideally of 1024).",
            stacklevel=2,
        )
    return block


def for_backend(terminal_bonus: bool = True, batch_size: int = 0,
                shards: int = 1, backend: Optional[str] = None,
                env_config=None) -> FastEnvConfig:
    """A FastEnvConfig tuned for the current JAX backend.

    On TPU: the fused kernel with the on-core PRNG, block size set to the
    largest divisor of the per-shard batch <= DEFAULT_BLOCK (the kernel
    requires batch % block == 0). On CPU (tests, ``--cpu`` runs, the
    multichip dry-run): interpret mode with external jax.random bits.
    ``backend="lax"`` selects the op-by-op differential oracle (always
    external-RNG).

    ``env_config`` (an :class:`tpu2048.env.EnvConfig`) carries the reward
    variant: SHAPED envs run the kernel in shaped mode with the config's
    stall parameters (``terminal_bonus`` then comes from it too).
    """
    on_cpu = jax.default_backend() == "cpu"
    per_shard = max(batch_size // max(shards, 1), 1)
    block = fit_block(per_shard, ps.DEFAULT_BLOCK) if batch_size \
        else ps.DEFAULT_BLOCK
    shaped_kwargs = {}
    if env_config is not None:
        from tpu2048.env.env import SHAPED  # local import: no cycle

        terminal_bonus = env_config.terminal_bonus
        if env_config.reward == SHAPED:
            shaped_kwargs = dict(
                shaped=True,
                max_consecutive_actions=env_config.max_consecutive_actions,
                stall_force_done=env_config.stall_force_done,
                reset_shaping=env_config.reset_shaping_on_reset,
            )
    return FastEnvConfig(
        terminal_bonus=terminal_bonus,
        block_size=block,
        interpret=on_cpu,
        external_rng=on_cpu or backend == "lax",
        backend=backend or "pallas",
        **shaped_kwargs,
    )


@struct.dataclass
class FastEnvState:
    boards: jax.Array  # (16, B) int8 cell-major
    legal: jax.Array  # (B, 4) bool — legal moves of `boards`
    score: jax.Array  # (B,) int32 episode merge score
    episode_steps: jax.Array  # (B,) int32
    episode_return: jax.Array  # (B,) f32
    seed: jax.Array  # () int32 — PRNG stream counter

    @property
    def batch_size(self) -> int:
        return self.boards.shape[1]


@struct.dataclass
class ShapedFastEnvState(FastEnvState):
    """FastEnvState + the shaped env's cross-episode shaping lanes.

    Mirrors the classic :class:`tpu2048.env.env.EnvState` shaping fields
    (Game2048_env.py:87,92-95): ``prev_max`` is the running best max tile
    VALUE (not exponent; init 2, faithfully NOT reset between episodes),
    the consec lanes are the anti-stall counters. A separate class so
    simple-mode checkpoints keep their exact pytree.
    """

    prev_max: jax.Array = None  # (B,) int32 tile value
    consec_action: jax.Array = None  # (B,) int32, -1 = none yet
    consec_count: jax.Array = None  # (B,) int32
    last_consec_penalty: jax.Array = None  # (B,) f32


@struct.dataclass
class FastTimeStep:
    obs: jax.Array  # (16, B) int8 — post-step board BEFORE auto-reset
    reward: jax.Array  # (B,) f32
    done: jax.Array  # (B,) bool
    valid: jax.Array  # (B,) bool
    merge_score: jax.Array  # (B,) int32
    max_number: jax.Array  # (B,) int32
    episode_return: jax.Array  # (B,) f32
    episode_steps: jax.Array  # (B,) int32


def fast_reset(config: FastEnvConfig, key, batch_size: int) -> FastEnvState:
    k_boards, k_seed = jax.random.split(key)
    boards = jax.vmap(board_ops.init_board)(
        jax.random.split(k_boards, batch_size)
    )
    common = dict(
        boards=ps.to_cell_major(boards),
        legal=board_ops.legal_moves_mask(boards),
        score=jnp.zeros((batch_size,), jnp.int32),
        episode_steps=jnp.zeros((batch_size,), jnp.int32),
        episode_return=jnp.zeros((batch_size,), jnp.float32),
        seed=jax.random.randint(k_seed, (), 0, 1 << 30, dtype=jnp.int32),
    )
    if config.shaped:
        return ShapedFastEnvState(
            **common,
            prev_max=jnp.full((batch_size,), 2, jnp.int32),
            consec_action=jnp.full((batch_size,), -1, jnp.int32),
            consec_count=jnp.zeros((batch_size,), jnp.int32),
            last_consec_penalty=jnp.full((batch_size,), -1.0, jnp.float32),
        )
    return FastEnvState(**common)


# The kernel's OWN draw helpers — shared, not mirrored, so the oracle
# cannot silently diverge from the kernel on a one-sided edit. Bit
# parity of lax_fast_step vs fused_env_step hangs on these.
_uniform_mod = ps._uniform_mod


def _tile_value(bits):
    return ps._tile_value(bits).astype(jnp.int8)


def _rand_legal_action(legal, rng_row):
    """The kernel's uniform-over-legal pick, on a (B, 4) bool mask and
    one (B,) uint32 bit row — shared by the lax oracle step and the
    rollout-eval oracle so the two can never diverge."""
    legal_i = legal.astype(jnp.int32)
    n_legal = jnp.sum(legal_i, axis=-1)
    pick = _uniform_mod(rng_row, n_legal)
    before = jnp.cumsum(legal_i, axis=-1) - legal_i  # exclusive csum
    return jnp.argmax(
        legal & (before == pick[:, None]), axis=-1
    ).astype(jnp.int32)


def lax_fast_step(boards_cm, actions, rng_bits, force_done=None,
                  shaped_done: bool = False):
    """Pure-lax mirror of :func:`ps.fused_env_step` (emit everything).

    Consumes the identical 8 uint32 bit rows per lane the kernel does
    (action-pick, unused, spawn-pos, spawn-val, reset-p1, reset-p2,
    reset-v1, reset-v2) and matches it bit-for-bit — the differential
    oracle for the kernel and the CPU fallback of the fast env.

    ``shaped_done`` switches to the kernel's shaped mode (v1 done
    semantics ``(~moved & game_over) | force_done``) and inserts
    ``game_over`` into the returned tuple after ``second_exp``, exactly
    like the kernel's ``force_done`` path.

    Returns the full kernel tuple ``(new_boards_cm, score, valid, done,
    max_exp, second_exp[, game_over], pre_reset_cm, legal_next_4B)``.
    """
    boards = ps.from_cell_major(boards_cm)
    b = boards.shape[0]
    cand_b, cand_s, cand_m = board_ops.move_all(boards)
    legal = jnp.moveaxis(cand_m, 0, -1)  # (B, 4)

    # In-kernel random-legal policy for lanes with action < 0.
    rand_act = _rand_legal_action(legal, rng_bits[0])
    actions = jnp.asarray(actions, jnp.int32)
    action = jnp.where(actions < 0, rand_act, actions)

    merged, score, moved = board_ops.select_move(cand_b, cand_s, cand_m, action)

    # Spawn on a uniformly-random empty cell of the merged board.
    n_empty = jnp.sum((merged == 0).astype(jnp.int32), axis=(-1, -2))
    idx = _uniform_mod(rng_bits[2], n_empty)
    val = _tile_value(rng_bits[3])
    spawned = jax.vmap(board_ops.spawn_at)(merged, idx, val)
    new_board = jnp.where(moved[:, None, None], spawned, boards)

    game_over = board_ops.is_game_over(new_board)
    if shaped_done:
        done = ~moved & game_over
        if force_done is not None:
            done = done | force_done
    else:
        done = game_over

    # Terminal stats: max exponent and the second-max with the kernel's
    # "skip the first max cell in cell order" semantics.
    flat = new_board.reshape(b, 16).astype(jnp.int32)
    mx = jnp.max(flat, axis=-1)
    first_max = jnp.argmax(flat == mx[:, None], axis=-1)
    others = jnp.where(
        jnp.arange(16)[None, :] == first_max[:, None], -1, flat
    )
    second = jnp.maximum(jnp.max(others, axis=-1), 0)

    # Auto-reset: fresh 2-tile board from the reset bit rows.
    p1 = _uniform_mod(rng_bits[4], jnp.full((b,), 16, jnp.int32))
    p2r = _uniform_mod(rng_bits[5], jnp.full((b,), 15, jnp.int32))
    p2 = jnp.where(p2r >= p1, p2r + 1, p2r)
    v1 = _tile_value(rng_bits[6])
    v2 = _tile_value(rng_bits[7])
    cells = jnp.arange(16)[None, :]
    fresh = jnp.where(
        cells == p1[:, None],
        v1[:, None],
        jnp.where(cells == p2[:, None], v2[:, None], jnp.int8(0)),
    ).reshape(b, 4, 4)
    final = jnp.where(done[:, None, None], fresh, new_board)
    legal_next = board_ops.legal_moves_mask(final)

    head = (
        ps.to_cell_major(final),
        score,
        moved,
        done,
        jnp.max(new_board, axis=(-1, -2)),
        second.astype(jnp.int8),
    )
    if shaped_done:
        head = head + (game_over,)
    return head + (
        ps.to_cell_major(new_board),
        legal_next.T.astype(jnp.int8),
    )


def fast_rollout(
    config: FastEnvConfig,
    state: FastEnvState,
    k_steps: int,
) -> Tuple[FastEnvState, jax.Array, jax.Array]:
    """``k_steps`` random-policy steps in ONE kernel launch.

    The multi-step fast path for regimes that need no per-step outputs —
    bench rollouts, replay burn-in, random-policy throughput runs: the
    board and episode accounting stay in VMEM across the window
    (:func:`tpu2048.ops.pallas_step.fused_env_rollout`), amortizing the
    per-step kernel launch + HBM round-trip ``k_steps``-fold (~1.9x
    end-to-end vs single-step launches at the bench batch).

    Equivalent to ``k_steps`` calls of :func:`fast_step` with
    ``actions=None, need_obs=False, need_legal=False`` (``state.legal``
    goes stale, like any ``need_legal=False`` step; on the external-RNG
    path the equivalence is bit-exact and tested —
    tests/test_pallas_step.py).

    Returns:
      ``(new_state, reward_sum, done_count)`` — ``reward_sum`` ``(B,)``
      int32 (rewards are integer-valued; the sum is exact) and
      ``done_count`` ``(B,)`` int32 over the window.

    SHAPED configs (QLearningBase semantics) run too — the stall counter
    advances IN-KERNEL on the resolved random action and force-terminates
    at the cutoff (Game2048_env.py:110-127; VERDICT r4 #8) — but a shaped
    window maintains NO reward lanes: ``reward_sum`` is zeros and
    ``episode_return``/``prev_max``/``last_consec_penalty`` go stale
    (shaped rewards are host-side float shaping, and the rollout's
    consumers — eval latches, done counts, board evolution — are
    reward-free). Step with :func:`fast_step` when shaped returns matter.
    """
    b = state.batch_size
    if config.backend == "lax":
        # Oracle backend: no fused kernel — run the window step-by-step.
        # (Each fast_step re-draws its own rng bits internally, so the
        # kernel path's block draw below would be dead compute here.)
        # Shaped: the resolved random action is recomputed from the same
        # bit row the kernel consumes and fed explicitly (the shaped step
        # needs the action stream for its stall counters).
        rsum = jnp.zeros((b,), jnp.int32)
        dcnt = jnp.zeros((b,), jnp.int32)
        for _ in range(k_steps):
            if config.shaped:
                bits0 = jax.random.bits(
                    jax.random.fold_in(jax.random.PRNGKey(2048), state.seed),
                    (8, b), jnp.uint32,
                )[0]
                legal = board_ops.legal_moves_mask(
                    ps.from_cell_major(state.boards)
                )
                act = _rand_legal_action(legal, bits0)
                state, ts = fast_step(config, state, act)
            else:
                state, ts = fast_step(config, state)
                rsum = rsum + ts.reward.astype(jnp.int32)
            dcnt = dcnt + ts.done.astype(jnp.int32)
        return state, rsum, dcnt
    rng_bits = None
    if config.external_rng:
        # Per-inner-step streams drawn exactly as fast_step draws them at
        # seed, seed+1, ... — keeps the k-step window bit-identical to k
        # single steps on the test path.
        rng_bits = jnp.concatenate(
            [
                jax.random.bits(
                    jax.random.fold_in(
                        jax.random.PRNGKey(2048), state.seed + i
                    ),
                    (8, b),
                    jnp.uint32,
                )
                for i in range(k_steps)
            ],
            axis=0,
        )
    outs = ps.fused_env_rollout(
        state.boards,
        state.score,
        state.episode_steps,
        state.episode_return,
        jnp.asarray(state.seed, jnp.int32),
        k_steps,
        rng_bits,
        stall_state=(
            (state.consec_action, state.consec_count)
            if config.shaped else None
        ),
        terminal_bonus=config.terminal_bonus,
        stall_limit=config.stall_force_done,
        reset_shaping=config.reset_shaping,
        block_size=fit_block(b, config.block_size),
        interpret=config.interpret,
    )
    boards, score, steps, ep_ret, rsum, dcnt = outs[:6]
    if config.shaped:
        c_act, c_cnt = outs[6]
        new_state = state.replace(
            boards=boards,
            score=score,
            episode_steps=steps,
            episode_return=ep_ret,
            seed=state.seed + k_steps,
            consec_action=c_act,
            consec_count=c_cnt,
        )
    else:
        new_state = FastEnvState(
            boards=boards,
            legal=state.legal,
            score=score,
            episode_steps=steps,
            episode_return=ep_ret,
            seed=state.seed + k_steps,
        )
    return new_state, rsum, dcnt


def make_sharded_kernel(
    config: FastEnvConfig, mesh, data_axis: str = "data",
    need_legal: bool = False,
):
    """Wrap the fused kernel in ``shard_map`` over the data mesh axis.

    Each device runs the kernel on its local shard of envs — zero
    cross-device traffic. The device's PRNG stream is decorrelated by
    folding ``axis_index`` into the step seed.

    Returns a function with the signature of
    :func:`tpu2048.ops.pallas_step.fused_env_step` (boards sharded
    ``P(None, data)``, lane outputs ``P(data)``); always emits the
    pre-reset board, and the post-reset legal mask when ``need_legal``.
    """
    from jax.sharding import PartitionSpec as P

    external = config.external_rng
    use_lax = config.backend == "lax"
    shaped = config.shaped
    n_head = 7 + (1 if shaped else 0)  # outputs through pre-reset boards

    def local(boards, actions, seed, *extra):
        extra = list(extra)
        rng_bits = extra.pop(0) if external else None
        force_done = extra.pop(0) if shaped else None
        if use_lax:
            outs = lax_fast_step(
                boards, actions, rng_bits, force_done, shaped_done=shaped
            )
            return outs if need_legal else outs[:n_head]
        # Decorrelate device PRNG streams (no-op when bits are external —
        # they are already sharded per device).
        seed = seed + jax.lax.axis_index(data_axis) * jnp.int32(7919)
        return ps.fused_env_step(
            boards,
            actions,
            seed,
            rng_bits,
            force_done,
            # Fit to the PER-DEVICE shard here (boards is the local
            # slice at trace time): config.block_size was derived from
            # the replay layout, which need not match the mesh's data
            # axis (e.g. programmatic train() with replay_shards=1 on
            # an 8-device mesh).
            block_size=fit_block(boards.shape[1], config.block_size),
            emit_pre_reset=True,
            emit_legal=need_legal,
            interpret=config.interpret,
        )

    in_specs = [P(None, data_axis), P(data_axis), P()]
    if external:
        in_specs.append(P(None, data_axis))
    if shaped:
        in_specs.append(P(data_axis))  # force_done lane
    out_specs = (
        P(None, data_axis),  # new boards
        P(data_axis),  # score
        P(data_axis),  # valid
        P(data_axis),  # done
        P(data_axis),  # max_exp
        P(data_axis),  # second_exp
    )
    if shaped:
        out_specs = out_specs + (P(data_axis),)  # game_over
    out_specs = out_specs + (P(None, data_axis),)  # pre-reset boards
    if need_legal:
        out_specs = out_specs + (P(None, data_axis),)  # (4, B) legal
    return jax.shard_map(
        local, mesh=mesh, in_specs=tuple(in_specs), out_specs=out_specs,
        check_vma=False,
    )


def fast_step(
    config: FastEnvConfig,
    state: FastEnvState,
    actions: Optional[jax.Array] = None,
    need_obs: bool = False,
    need_legal: bool = False,
    sharded_kernel=None,
) -> Tuple[FastEnvState, FastTimeStep]:
    """One fused step. ``actions=None`` -> in-kernel random-legal policy.

    ``need_obs=True`` additionally materializes the pre-reset board in the
    timestep (for replay insertion); ``need_legal=True`` refreshes
    ``state.legal`` from the kernel (otherwise the field goes stale — the
    bench/random-policy path never reads it). Both off by default to save
    bandwidth. ``sharded_kernel`` (from :func:`make_sharded_kernel`, built
    with matching ``need_legal``) routes the kernel through shard_map for
    multi-device meshes.
    """
    if config.shaped:
        return _shaped_fast_step(
            config, state, actions, need_obs, need_legal, sharded_kernel
        )
    b = state.batch_size
    if actions is None:
        actions = jnp.full((b,), -1, jnp.int32)
    rng_bits = None
    if config.external_rng:
        key = jax.random.fold_in(jax.random.PRNGKey(2048), state.seed)
        rng_bits = jax.random.bits(key, (8, b), jnp.uint32)
    if sharded_kernel is not None:
        args = (state.boards, actions, jnp.asarray(state.seed, jnp.int32))
        if rng_bits is not None:
            args = args + (rng_bits,)
        outs = sharded_kernel(*args)
        need = True  # sharded kernel always emits pre-reset
        if need_legal and len(outs) < 8:
            raise ValueError(
                "need_legal=True requires a sharded kernel built with "
                "make_sharded_kernel(..., need_legal=True)"
            )
    elif config.backend == "lax":
        outs = lax_fast_step(state.boards, actions, rng_bits)
        need = True
    else:
        outs = ps.fused_env_step(
            state.boards,
            actions,
            state.seed,
            rng_bits,
            block_size=fit_block(b, config.block_size),
            emit_pre_reset=need_obs,
            emit_legal=need_legal,
            interpret=config.interpret,
        )
        need = need_obs
    new_boards, merge_score, valid, done, max_exp, second_exp = outs[:6]
    valid = jnp.asarray(valid) != 0 if valid.dtype != jnp.bool_ else valid
    done = jnp.asarray(done) != 0 if done.dtype != jnp.bool_ else done
    obs = outs[6] if need else new_boards
    if need_legal:
        legal = (outs[-1] != 0).T  # (4, B) int8 -> (B, 4) bool
    else:
        legal = state.legal

    # Simple reward (nopenalty:122-138) + driver terminal bonus
    # (mainDQL:202-213).
    reward = jnp.where(
        ~valid & ~done, jnp.float32(-10.0), merge_score.astype(jnp.float32)
    )
    if config.terminal_bonus:
        max_val = jnp.left_shift(jnp.int32(1), max_exp.astype(jnp.int32))
        sec_val = jnp.left_shift(jnp.int32(1), second_exp.astype(jnp.int32))
        sec_val = jnp.where(second_exp > 0, sec_val, 0)
        bonus = jnp.where(
            max_val >= 2048,
            100.0,
            jnp.where((max_val >= 1024) & (sec_val >= 1024), 50.0, 0.0),
        )
        reward = reward + jnp.where(done, bonus, 0.0).astype(jnp.float32)

    episode_return = state.episode_return + reward
    episode_steps = state.episode_steps + 1
    score = state.score + merge_score
    max_number = jnp.where(
        max_exp > 0,
        jnp.left_shift(jnp.int32(1), max_exp.astype(jnp.int32)),
        0,
    )
    ts = FastTimeStep(
        obs=obs,
        reward=reward,
        done=done,
        valid=valid,
        merge_score=merge_score,
        max_number=max_number,
        episode_return=episode_return,
        episode_steps=episode_steps,
    )
    new_state = FastEnvState(
        boards=new_boards,
        legal=legal,
        score=jnp.where(done, 0, score),
        episode_steps=jnp.where(done, 0, episode_steps),
        episode_return=jnp.where(done, 0.0, episode_return),
        seed=state.seed + 1,
    )
    return new_state, ts


def _shaped_fast_step(
    config: FastEnvConfig,
    state: "ShapedFastEnvState",
    actions,
    need_obs: bool,
    need_legal: bool,
    sharded_kernel=None,
) -> Tuple["ShapedFastEnvState", FastTimeStep]:
    """Shaped-reward fast step (QLearningBase env, Game2048_env.py:78-205).

    Decomposition: the kernel runs the board mechanics with the v1 done
    rule (``done = (~moved & game_over) | force_done``) and emits
    ``game_over`` separately; everything float — the shaped reward
    (:func:`tpu2048.env.rewards.shaped_reward`, the SAME function the
    classic lax env calls, so the formulas cannot diverge), the stall
    penalty ladder, and the ``prev_max`` bonus state — is fused
    elementwise lane math outside the kernel. The stall force-done cutoff
    is a pure function of the action stream, computed BEFORE the kernel
    and passed in as a lane.

    Given identical boards, actions, and spawn draws this matches
    :func:`tpu2048.env.env.step_with_spawn` on a SHAPED config bit-for-bit
    (tests/test_fast_shaped.py).
    """
    b = state.batch_size
    if actions is None:
        raise ValueError(
            "the shaped fast env requires explicit actions: its stall "
            "counters (Game2048_env.py:110-127) are a function of the "
            "action stream, which the in-kernel random policy never "
            "exposes. Use the lax engine for random-policy shaped runs."
        )
    actions = jnp.asarray(actions, jnp.int32)

    # Stall counters (Game2048_env.py:110-127) — pre-kernel lane math.
    same = actions == state.consec_action
    consec_count = jnp.where(same, state.consec_count + 1, 1)
    force_done = consec_count > config.stall_force_done

    rng_bits = None
    if config.external_rng:
        key = jax.random.fold_in(jax.random.PRNGKey(2048), state.seed)
        rng_bits = jax.random.bits(key, (8, b), jnp.uint32)
    if sharded_kernel is not None:
        args = (state.boards, actions, jnp.asarray(state.seed, jnp.int32))
        if rng_bits is not None:
            args = args + (rng_bits,)
        outs = sharded_kernel(*args, force_done)
        have_pre = True
        if need_legal and len(outs) < 9:
            raise ValueError(
                "need_legal=True requires a sharded kernel built with "
                "make_sharded_kernel(..., need_legal=True)"
            )
    elif config.backend == "lax":
        outs = lax_fast_step(
            state.boards, actions, rng_bits, force_done, shaped_done=True
        )
        have_pre = True
    else:
        outs = ps.fused_env_step(
            state.boards,
            actions,
            state.seed,
            rng_bits,
            force_done,
            block_size=fit_block(b, config.block_size),
            emit_pre_reset=need_obs,
            emit_legal=need_legal,
            interpret=config.interpret,
        )
        have_pre = need_obs
    (new_boards, merge_score, valid, done, max_exp, second_exp,
     game_over) = outs[:7]
    valid = jnp.asarray(valid) != 0 if valid.dtype != jnp.bool_ else valid
    done = jnp.asarray(done) != 0 if done.dtype != jnp.bool_ else done
    game_over = (
        jnp.asarray(game_over) != 0
        if game_over.dtype != jnp.bool_ else game_over
    )
    obs = outs[7] if have_pre else new_boards
    if need_legal:
        legal = (outs[-1] != 0).T  # (4, B) int8 -> (B, 4) bool
    else:
        legal = state.legal

    max_number = jnp.where(
        max_exp > 0,
        jnp.left_shift(jnp.int32(1), max_exp.astype(jnp.int32)),
        0,
    )
    # Shaped reward + stall penalty — the classic env's exact code path
    # (env.step_with_spawn SHAPED branch, Game2048_env.py:110-127,136-205).
    from tpu2048.env import rewards as rw

    reward, new_prev_max = rw.shaped_reward(
        merge_score, valid, game_over, max_number, state.prev_max
    )
    last_penalty = jnp.where(same, state.last_consec_penalty, -1.0)
    stalled = consec_count > config.max_consecutive_actions
    penalty = jnp.maximum(last_penalty * 1.1, -10.0)
    last_penalty = jnp.where(stalled, penalty, last_penalty)
    reward = reward + jnp.where(stalled, penalty, 0.0)

    episode_return = state.episode_return + reward
    episode_steps = state.episode_steps + 1
    score = state.score + merge_score
    ts = FastTimeStep(
        obs=obs,
        reward=reward,
        done=done,
        valid=valid,
        merge_score=merge_score,
        max_number=max_number,
        episode_return=episode_return,
        episode_steps=episode_steps,
    )
    # Auto-reset: episode lanes clear; shaping lanes persist across
    # episodes (faithful to Game2048_env.py:187-191) unless reset_shaping.
    consec_action = actions
    if config.reset_shaping:
        new_prev_max = jnp.where(done, 2, new_prev_max)
        consec_action = jnp.where(done, -1, consec_action)
        consec_count = jnp.where(done, 0, consec_count)
        last_penalty = jnp.where(done, -1.0, last_penalty)
    new_state = ShapedFastEnvState(
        boards=new_boards,
        legal=legal,
        score=jnp.where(done, 0, score),
        episode_steps=jnp.where(done, 0, episode_steps),
        episode_return=jnp.where(done, 0.0, episode_return),
        seed=state.seed + 1,
        prev_max=new_prev_max,
        consec_action=consec_action,
        consec_count=consec_count,
        last_consec_penalty=last_penalty,
    )
    return new_state, ts


@struct.dataclass
class EvalLatch:
    """Per-lane first-completion latches for random-policy rollout eval.

    The generic eval harness latches each board's first completion on the
    host side, one kernel launch per step; for the RANDOM policy the
    whole latch lives in VMEM inside the multi-step rollout kernel
    (:func:`tpu2048.ops.pallas_step.fused_env_rollout`, latch mode), so a
    1000-game random eval is a handful of launches instead of thousands.
    """

    latched: jax.Array  # (B,) int8 — 1 once the lane's first game ended
    score: jax.Array  # (B,) int32 — episode merge score at first done
    steps: jax.Array  # (B,) int32 — episode length at first done
    max_exp: jax.Array  # (B,) int8 — max tile exponent at first done
    action_counts: jax.Array  # (4, B) int32 — live-step action counts


def eval_latch_init(batch_size: int) -> EvalLatch:
    return EvalLatch(
        latched=jnp.zeros((batch_size,), jnp.int8),
        score=jnp.zeros((batch_size,), jnp.int32),
        steps=jnp.zeros((batch_size,), jnp.int32),
        max_exp=jnp.zeros((batch_size,), jnp.int8),
        action_counts=jnp.zeros((4, batch_size), jnp.int32),
    )


def fast_rollout_eval(
    config: FastEnvConfig,
    state: FastEnvState,
    latch: EvalLatch,
    k_steps: int,
) -> Tuple[FastEnvState, EvalLatch]:
    """``k_steps`` random-legal-policy steps with in-kernel first-
    completion latching — the random-eval fast path (the batched
    counterpart of GameDemo.py:272-285's random mode, with one documented
    delta: the reference samples uniformly over ALL 4 actions including
    illegal ones, while this path is uniform over LEGAL moves only — see
    eval/evaluate.py:_evaluate_fast_random).

    Same window semantics as :func:`fast_rollout`; additionally each
    lane's FIRST episode end records (score, length, max tile) into
    ``latch`` and live (pre-latch) actions are counted per direction.
    The ``backend="lax"`` oracle reproduces the kernel bit-for-bit on
    the external-RNG path (tests/test_pallas_step.py).

    SHAPED configs run too (the stall cutoff lanes advance in-kernel on
    the resolved action — VERDICT r4 #8): the latched stats are
    reward-free (merge score / length / max tile), so the shaped reward
    channel staying host-side costs eval nothing.
    """
    b = state.batch_size
    if config.backend == "lax":
        # Oracle: step-by-step, latches maintained in lax ops. The
        # resolved random action is recomputed from the same bit row the
        # step consumes (shared helper _rand_legal_action). Shaped configs
        # feed it explicitly — the shaped step's stall counters are a
        # function of the action stream.
        for _ in range(k_steps):
            bits0 = jax.random.bits(
                jax.random.fold_in(jax.random.PRNGKey(2048), state.seed),
                (8, b), jnp.uint32,
            )[0]
            boards = ps.from_cell_major(state.boards)
            legal = board_ops.legal_moves_mask(boards)
            act = _rand_legal_action(legal, bits0)
            pre_score = state.score
            pre_steps = state.episode_steps
            state, ts = fast_step(
                config, state, act if config.shaped else None
            )
            live = latch.latched == 0
            newly = live & ts.done
            one = jnp.int32(1)
            acnt = latch.action_counts + (
                (jnp.arange(4, dtype=jnp.int32)[:, None] == act[None, :])
                & live[None, :]
            ).astype(jnp.int32)
            latch = EvalLatch(
                latched=jnp.where(newly, jnp.int8(1), latch.latched),
                score=jnp.where(newly, pre_score + ts.merge_score,
                                latch.score),
                steps=jnp.where(newly, pre_steps + one, latch.steps),
                max_exp=jnp.where(
                    newly,
                    jnp.max(ts.obs, axis=0).astype(jnp.int8),
                    latch.max_exp,
                ),
                action_counts=acnt,
            )
        return state, latch
    rng_bits = None
    if config.external_rng:
        rng_bits = jnp.concatenate(
            [
                jax.random.bits(
                    jax.random.fold_in(
                        jax.random.PRNGKey(2048), state.seed + i
                    ),
                    (8, b),
                    jnp.uint32,
                )
                for i in range(k_steps)
            ],
            axis=0,
        )
    outs = ps.fused_env_rollout(
        state.boards,
        state.score,
        state.episode_steps,
        state.episode_return,
        jnp.asarray(state.seed, jnp.int32),
        k_steps,
        rng_bits,
        (latch.latched, latch.score, latch.steps, latch.max_exp,
         latch.action_counts),
        stall_state=(
            (state.consec_action, state.consec_count)
            if config.shaped else None
        ),
        terminal_bonus=config.terminal_bonus,
        stall_limit=config.stall_force_done,
        reset_shaping=config.reset_shaping,
        block_size=fit_block(b, config.block_size),
        interpret=config.interpret,
    )
    boards, score, steps, ep_ret, _rsum, _dcnt, lat = outs[:7]
    if config.shaped:
        c_act, c_cnt = outs[7]
        new_state = state.replace(
            boards=boards,
            score=score,
            episode_steps=steps,
            episode_return=ep_ret,
            seed=state.seed + k_steps,
            consec_action=c_act,
            consec_count=c_cnt,
        )
    else:
        new_state = FastEnvState(
            boards=boards,
            legal=state.legal,
            score=score,
            episode_steps=steps,
            episode_return=ep_ret,
            seed=state.seed + k_steps,
        )
    new_latch = EvalLatch(
        latched=lat[0], score=lat[1], steps=lat[2], max_exp=lat[3],
        action_counts=lat[4],
    )
    return new_state, new_latch
