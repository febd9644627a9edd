"""Fast batched env backed by the fused Pallas step kernel.

Speed-of-light path for the simple-reward environment
(Game2048_nopenalty_env.py semantics, fixed variant): board state lives
cell-major ``(16, B)`` in HBM and the whole step (merge/legality/spawn/
game-over/auto-reset, optional in-kernel random-legal policy) is one
kernel launch — >100M env-steps/s on a single v5e chip vs ~2.6M for the
op-by-op lax env (bench.py). Reward (simple + optional terminal bonus,
mainDQL:202-213) and episode accounting are a handful of fused lane ops
outside the kernel.

The classic :mod:`tpu2048.env.env` remains the reference-parity path
(shaped rewards, quirk-compat, explicit-spawn replay); this one is for
throughput-critical rollouts and training.
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


@struct.dataclass
class FastEnvState:
    boards: jax.Array  # (16, B) int8 cell-major
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
    boards = jax.vmap(board_ops.init_board)(
        jax.random.split(key, batch_size)
    )
    return FastEnvState(
        boards=ps.to_cell_major(boards),
        score=jnp.zeros((batch_size,), jnp.int32),
        episode_steps=jnp.zeros((batch_size,), jnp.int32),
        episode_return=jnp.zeros((batch_size,), jnp.float32),
        seed=jax.random.randint(key, (), 0, 1 << 30, dtype=jnp.int32),
    )


def make_sharded_kernel(config: FastEnvConfig, mesh, data_axis: str = "data"):
    """Wrap the fused kernel in ``shard_map`` over the data mesh axis.

    Each device runs the kernel on its local shard of envs — zero
    cross-device traffic. The device's PRNG stream is decorrelated by
    folding ``axis_index`` into the step seed.

    Returns a function with the signature of
    :func:`tpu2048.ops.pallas_step.fused_env_step` (boards sharded
    ``P(None, data)``, lane outputs ``P(data)``).
    """
    from jax.sharding import PartitionSpec as P

    external = config.external_rng

    def local(boards, actions, seed, rng_bits=None):
        # Decorrelate device PRNG streams (no-op when bits are external —
        # they are already sharded per device).
        seed = seed + jax.lax.axis_index(data_axis) * jnp.int32(7919)
        return ps.fused_env_step(
            boards,
            actions,
            seed,
            rng_bits,
            block_size=config.block_size,
            emit_pre_reset=True,
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
    return jax.shard_map(
        local, mesh=mesh, in_specs=tuple(in_specs), out_specs=out_specs,
        check_vma=False,
    )


def fast_step(
    config: FastEnvConfig,
    state: FastEnvState,
    actions: Optional[jax.Array] = None,
    need_obs: bool = False,
    sharded_kernel=None,
) -> Tuple[FastEnvState, FastTimeStep]:
    """One fused step. ``actions=None`` -> in-kernel random-legal policy.

    ``need_obs=True`` additionally materializes the pre-reset board in the
    timestep (for replay insertion); off by default to save bandwidth.
    ``sharded_kernel`` (from :func:`make_sharded_kernel`) routes the kernel
    through shard_map for multi-device meshes.
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
    else:
        outs = ps.fused_env_step(
            state.boards,
            actions,
            state.seed,
            rng_bits,
            block_size=config.block_size,
            emit_pre_reset=need_obs,
            interpret=config.interpret,
        )
        need = need_obs
    new_boards, merge_score, valid, done, max_exp, second_exp = outs[:6]
    obs = outs[6] if need else new_boards

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
        score=jnp.where(done, 0, score),
        episode_steps=jnp.where(done, 0, episode_steps),
        episode_return=jnp.where(done, 0.0, episode_return),
        seed=state.seed + 1,
    )
    return new_state, ts
