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

    def __post_init__(self):
        if self.backend not in ("pallas", "lax"):
            raise ValueError(f"unknown fast-env backend {self.backend!r}")
        if self.backend == "lax" and not self.external_rng:
            raise ValueError("backend='lax' requires external_rng=True")


def resolve_engine(env_config, engine: str,
                   require_auto_reset: bool = True) -> str:
    """THE fast-engine eligibility rule, shared by every driver.

    The fused kernel implements exactly the simple-reward
    (nopenalty:122-138), non-quirk, auto-resetting semantics; anything
    else needs the op-by-op lax env. ``require_auto_reset=False`` is for
    the eval harness, which latches each board's first completion and so
    tolerates (ignores) the kernel's free auto-restarts.

    "auto" picks "fast" when eligible; an explicit "fast" on an
    ineligible env raises.
    """
    from tpu2048.env.env import SIMPLE  # local import: no cycle

    fast_ok = (
        env_config.reward == SIMPLE
        and not env_config.quirk_compat
        and (env_config.auto_reset or not require_auto_reset)
    )
    if engine == "auto":
        return "fast" if fast_ok else "lax"
    if engine == "fast" and not fast_ok:
        raise ValueError(
            "engine='fast' requires simple-reward, non-quirk"
            + (", auto-reset" if require_auto_reset else "")
            + f" env semantics (got {env_config})"
        )
    if engine not in ("fast", "lax"):
        raise ValueError(f"unknown engine {engine!r}")
    return engine


def fit_block(batch: int, block: int) -> int:
    """Largest divisor of ``batch`` that is <= ``block`` (the kernel
    requires batch % block == 0)."""
    block = max(min(block, batch), 1)
    while batch % block:
        block -= 1
    return block


def for_backend(terminal_bonus: bool = True, batch_size: int = 0,
                shards: int = 1, backend: Optional[str] = None) -> FastEnvConfig:
    """A FastEnvConfig tuned for the current JAX backend.

    On TPU: the fused kernel with the on-core PRNG, block size set to the
    largest divisor of the per-shard batch <= DEFAULT_BLOCK (the kernel
    requires batch % block == 0). On CPU (tests, ``--cpu`` runs, the
    multichip dry-run): interpret mode with external jax.random bits.
    ``backend="lax"`` selects the op-by-op differential oracle (always
    external-RNG).
    """
    on_cpu = jax.default_backend() == "cpu"
    per_shard = max(batch_size // max(shards, 1), 1)
    block = fit_block(per_shard, ps.DEFAULT_BLOCK) if batch_size \
        else ps.DEFAULT_BLOCK
    return FastEnvConfig(
        terminal_bonus=terminal_bonus,
        block_size=block,
        interpret=on_cpu,
        external_rng=on_cpu or backend == "lax",
        backend=backend or "pallas",
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
    return FastEnvState(
        boards=ps.to_cell_major(boards),
        legal=board_ops.legal_moves_mask(boards),
        score=jnp.zeros((batch_size,), jnp.int32),
        episode_steps=jnp.zeros((batch_size,), jnp.int32),
        episode_return=jnp.zeros((batch_size,), jnp.float32),
        seed=jax.random.randint(k_seed, (), 0, 1 << 30, dtype=jnp.int32),
    )


# The kernel's OWN draw helpers — shared, not mirrored, so the oracle
# cannot silently diverge from the kernel on a one-sided edit. Bit
# parity of lax_fast_step vs fused_env_step hangs on these.
_uniform_mod = ps._uniform_mod


def _tile_value(bits):
    return ps._tile_value(bits).astype(jnp.int8)


def lax_fast_step(boards_cm, actions, rng_bits):
    """Pure-lax mirror of :func:`ps.fused_env_step` (emit everything).

    Consumes the identical 8 uint32 bit rows per lane the kernel does
    (action-pick, unused, spawn-pos, spawn-val, reset-p1, reset-p2,
    reset-v1, reset-v2) and matches it bit-for-bit — the differential
    oracle for the kernel and the CPU fallback of the fast env.

    Returns the full kernel tuple ``(new_boards_cm, score, valid, done,
    max_exp, second_exp, pre_reset_cm, legal_next_4B)``.
    """
    boards = ps.from_cell_major(boards_cm)
    b = boards.shape[0]
    cand_b, cand_s, cand_m = board_ops.move_all(boards)
    legal = jnp.moveaxis(cand_m, 0, -1)  # (B, 4)
    legal_i = legal.astype(jnp.int32)
    n_legal = jnp.sum(legal_i, axis=-1)

    # In-kernel random-legal policy for lanes with action < 0.
    pick = _uniform_mod(rng_bits[0], n_legal)
    before = jnp.cumsum(legal_i, axis=-1) - legal_i  # exclusive csum
    rand_act = jnp.argmax(
        legal & (before == pick[:, None]), axis=-1
    ).astype(jnp.int32)
    actions = jnp.asarray(actions, jnp.int32)
    action = jnp.where(actions < 0, rand_act, actions)

    merged, score, moved = board_ops.select_move(cand_b, cand_s, cand_m, action)

    # Spawn on a uniformly-random empty cell of the merged board.
    n_empty = jnp.sum((merged == 0).astype(jnp.int32), axis=(-1, -2))
    idx = _uniform_mod(rng_bits[2], n_empty)
    val = _tile_value(rng_bits[3])
    spawned = jax.vmap(board_ops.spawn_at)(merged, idx, val)
    new_board = jnp.where(moved[:, None, None], spawned, boards)

    done = board_ops.is_game_over(new_board)

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

    return (
        ps.to_cell_major(final),
        score,
        moved,
        done,
        jnp.max(new_board, axis=(-1, -2)),
        second.astype(jnp.int8),
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
    """
    b = state.batch_size
    if config.backend == "lax":
        # Oracle backend: no fused kernel — run the window step-by-step.
        # (Each fast_step re-draws its own rng bits internally, so the
        # kernel path's block draw below would be dead compute here.)
        rsum = jnp.zeros((b,), jnp.int32)
        dcnt = jnp.zeros((b,), jnp.int32)
        for _ in range(k_steps):
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
    boards, score, steps, ep_ret, rsum, dcnt = ps.fused_env_rollout(
        state.boards,
        state.score,
        state.episode_steps,
        state.episode_return,
        jnp.asarray(state.seed, jnp.int32),
        k_steps,
        rng_bits,
        terminal_bonus=config.terminal_bonus,
        block_size=fit_block(b, config.block_size),
        interpret=config.interpret,
    )
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

    def local(boards, actions, seed, rng_bits=None):
        if use_lax:
            outs = lax_fast_step(boards, actions, rng_bits)
            return outs if need_legal else outs[:7]
        # Decorrelate device PRNG streams (no-op when bits are external —
        # they are already sharded per device).
        seed = seed + jax.lax.axis_index(data_axis) * jnp.int32(7919)
        return ps.fused_env_step(
            boards,
            actions,
            seed,
            rng_bits,
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
    out_specs = (
        P(None, data_axis),  # new boards
        P(data_axis),  # score
        P(data_axis),  # valid
        P(data_axis),  # done
        P(data_axis),  # max_exp
        P(data_axis),  # second_exp
        P(None, data_axis),  # pre-reset boards
    )
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
