"""Evaluation harness: batched deterministic rollouts.

Re-design of the reference's model evaluation, which was interactive-only
(GameDemo.py:288-316 ``model_play``: encode -> predict -> argmax over
legal moves, plus random and manual modes). Here evaluation is a batched
harness producing score / max-tile / episode-length distributions — the
numbers the reference's paper reports (max-tile frequency, 2048.pdf §5.1).

Policies are pure functions ``(boards, legal_mask, key) -> actions`` so
greedy-DQN, random-legal, and tabular-greedy all share one rollout loop.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from tpu2048.env import EnvConfig, env as envlib
from tpu2048.env import fast as fastlib
from tpu2048.ops import board as board_ops
from tpu2048.ops import pallas_step as ps

PolicyFn = Callable[[jax.Array, jax.Array, jax.Array], jax.Array]


@dataclasses.dataclass
class Policy:
    """A policy = a pure fn plus the weights it needs.

    Weights are threaded through jit as ARGUMENTS, never closed over:
    closure constants get inlined into the compiled program, and a 387 MB
    CNN baked into the HLO blows the remote-compile request limit of a
    tunneled TPU runtime (observed: HTTP 413 on the eval chunk) — besides
    forcing a recompile per checkpoint.
    """

    fn: Callable  # (params, boards, legal_mask, key) -> actions
    params: object = ()
    # True for the uniform-over-legal policy: the fused rollout kernel
    # implements the identical distribution in-kernel, so fast eval can
    # run k steps per launch with VMEM-resident latches instead of one
    # launch per step (fast_rollout_eval).
    in_kernel_random: bool = False

    def __call__(self, boards, legal_mask, key):
        return self.fn(self.params, boards, legal_mask, key)


def as_policy(policy) -> Policy:
    """Wrap a bare ``(boards, mask, key)`` callable (no weights)."""
    if isinstance(policy, Policy):
        return policy
    return Policy(fn=lambda p, b, m, k: policy(b, m, k), params=())


def random_legal_policy() -> Policy:
    """Uniform over legal moves (GameDemo random mode, GameDemo.py:272-285)."""

    def policy(params, boards, legal_mask, key):
        logits = jnp.where(legal_mask, 0.0, -1e9)
        return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)

    return Policy(fn=policy, in_kernel_random=True)


def greedy_dqn_policy(model, params) -> Policy:
    """Argmax of Q over legal moves (GameDemo.py:288-316)."""

    def policy(p, boards, legal_mask, key):
        q = model.apply({"params": p}, boards, train=False)
        q_legal = jnp.where(legal_mask, q, -jnp.inf)
        has_legal = jnp.any(legal_mask, axis=-1)
        return jnp.where(
            has_legal, jnp.argmax(q_legal, axis=-1), jnp.argmax(q, axis=-1)
        ).astype(jnp.int32)

    return Policy(fn=policy, params=params)


def greedy_tabular_policy(table) -> Policy:
    """Argmax of the hashed Q-table, restricted to legal moves."""
    from tpu2048.agents import tabular as tab

    def policy(table, boards, legal_mask, key):
        q = tab.qtable_lookup(table, boards)
        q_legal = jnp.where(legal_mask, q, -jnp.inf)
        has_legal = jnp.any(legal_mask, axis=-1)
        return jnp.where(
            has_legal, jnp.argmax(q_legal, axis=-1), jnp.argmax(q, axis=-1)
        ).astype(jnp.int32)

    return Policy(fn=policy, params=table)


@dataclasses.dataclass
class EvalResult:
    scores: np.ndarray  # (N,) final episode merge scores
    max_tiles: np.ndarray  # (N,) final max tile values
    lengths: np.ndarray  # (N,) episode lengths
    # (4,) total L/U/R/D actions over live steps — the reference's headline
    # tabular result table is per-action counts
    # (QLearningBase/plots/summary_statistics_cleaned.csv columns L/U/R/D).
    action_counts: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(4, np.int64)
    )

    @property
    def tile_distribution(self) -> Dict[int, int]:
        vals, counts = np.unique(self.max_tiles, return_counts=True)
        return {int(v): int(c) for v, c in zip(vals, counts)}

    def summary(self) -> dict:
        total_actions = max(int(self.action_counts.sum()), 1)
        return {
            "games": int(len(self.scores)),
            "score_mean": float(self.scores.mean()),
            "score_std": float(self.scores.std()),
            "score_max": int(self.scores.max()),
            "length_mean": float(self.lengths.mean()),
            "max_tile_distribution": self.tile_distribution,
            "best_tile": int(self.max_tiles.max()),
            "win_rate_2048": float((self.max_tiles >= 2048).mean()),
            # Per-action totals + fractions, keyed the reference's way
            # (L/U/R/D — the ~70% left-bias finding reads off these).
            "action_counts": {
                k: int(c)
                for k, c in zip("LURD", self.action_counts)
            },
            "action_fractions": {
                k: round(float(c) / total_actions, 4)
                for k, c in zip("LURD", self.action_counts)
            },
        }


def evaluate(
    policy: PolicyFn,
    num_games: int,
    key,
    env_config: EnvConfig = EnvConfig(reward="simple", auto_reset=False),
    batch_size: int = 512,
    max_steps: int = 4000,
    engine: str = "auto",
    fast_backend: str = None,
) -> EvalResult:
    """Play ``num_games`` full games under ``policy``; collect stats.

    ``engine``: "fast" rolls out on the fused Pallas step kernel (the
    production default for simple-reward fixed semantics — the kernel
    auto-resets finished boards, so the harness latches each board's FIRST
    completion and ignores the free restarts); "lax" keeps the op-by-op
    env (required for shaped/quirk modes); "auto" picks.
    """
    engine = fastlib.resolve_engine(
        env_config, engine, require_auto_reset=False
    )
    if engine == "fast":
        return _evaluate_fast(
            policy, num_games, key, env_config, batch_size, max_steps,
            fast_backend,
        )
    env_config = dataclasses.replace(env_config, auto_reset=False)
    scores: List[np.ndarray] = []
    tiles: List[np.ndarray] = []
    lengths: List[np.ndarray] = []

    # One fused jitted call per CHUNK of steps: mask -> policy -> env step,
    # scanned on device. Eager per-step dispatch would dominate wall time
    # (especially through a remote TPU tunnel).
    steps_per_call = 32

    policy = as_policy(policy)

    def chunk(params, state, carry, key):
        def body(c, k):
            state, done, fs, ft, fl, ac = c
            legal = board_ops.legal_moves_mask(state.board)
            actions = policy.fn(params, state.board, legal, k)
            # Count actions of still-live games only (finished boards keep
            # stepping as no-ops in this latched harness).
            ac = ac + jnp.sum(
                jax.nn.one_hot(actions, 4, dtype=jnp.int32)
                * (~done)[:, None].astype(jnp.int32),
                axis=0,
            )
            state, ts = envlib.step(env_config, state, actions)
            newly = ts.done & ~done
            fs = jnp.where(newly, state.score, fs)
            ft = jnp.where(newly, ts.max_number, ft)
            fl = jnp.where(newly, ts.episode_steps, fl)
            return (state, done | ts.done, fs, ft, fl, ac), None

        keys = jax.random.split(key, steps_per_call)
        (state, done, fs, ft, fl, ac), _ = jax.lax.scan(
            body, (state, *carry), keys
        )
        return state, (done, fs, ft, fl, ac)

    chunk = jax.jit(chunk)

    remaining = num_games
    action_counts = np.zeros(4, np.int64)
    while remaining > 0:
        b = min(batch_size, remaining)
        key, k_reset = jax.random.split(key)
        state = envlib.reset(env_config, k_reset, b)
        done = jnp.zeros((b,), bool)
        final_score = jnp.zeros((b,), jnp.int32)
        final_tile = jnp.zeros((b,), jnp.int32)
        final_len = jnp.zeros((b,), jnp.int32)
        act_counts = jnp.zeros((4,), jnp.int32)
        for _ in range(max_steps // steps_per_call + 1):
            key, k = jax.random.split(key)
            state, (done, final_score, final_tile, final_len, act_counts) = (
                chunk(
                    policy.params, state,
                    (done, final_score, final_tile, final_len, act_counts), k,
                )
            )
            if bool(done.all()):
                break
        # Any game hitting max_steps records its current standing.
        final_score = jnp.where(done, final_score, state.score)
        final_tile = jnp.where(
            done, final_tile, board_ops.max_tile_value(state.board)
        )
        final_len = jnp.where(done, final_len, state.episode_steps)
        scores.append(np.asarray(final_score))
        tiles.append(np.asarray(final_tile))
        lengths.append(np.asarray(final_len))
        action_counts += np.asarray(act_counts, np.int64)
        remaining -= b

    return EvalResult(
        scores=np.concatenate(scores),
        max_tiles=np.concatenate(tiles),
        lengths=np.concatenate(lengths),
        action_counts=action_counts,
    )


def _evaluate_fast(
    policy, num_games, key, env_config, batch_size, max_steps, fast_backend
) -> EvalResult:
    """Fast-engine rollouts: one fused kernel launch per step.

    The kernel auto-resets finished boards, so each lane's FIRST completion
    is latched (score = pre-step episode score + the terminal move's merge
    score; tile/length from the pre-reset timestep) and subsequent free
    restarts are masked out of the action counts.
    """
    policy = as_policy(policy)
    if policy.in_kernel_random and env_config.reward in (
        envlib.SIMPLE, envlib.SHAPED
    ):
        return _evaluate_fast_random(
            num_games, key, env_config, batch_size, max_steps, fast_backend
        )
    steps_per_call = 32
    scores: List[np.ndarray] = []
    tiles: List[np.ndarray] = []
    lengths: List[np.ndarray] = []
    action_counts = np.zeros(4, np.int64)

    def chunk(fcfg, params, state, carry, key):
        def body(c, k):
            state, done, fs, ft, fl, ac = c
            boards = ps.from_cell_major(state.boards)
            actions = policy.fn(params, boards, state.legal, k)
            ac = ac + jnp.sum(
                jax.nn.one_hot(actions, 4, dtype=jnp.int32)
                * (~done)[:, None].astype(jnp.int32),
                axis=0,
            )
            new_state, ts = fastlib.fast_step(
                fcfg, state, actions, need_legal=True
            )
            newly = ts.done & ~done
            fs = jnp.where(newly, state.score + ts.merge_score, fs)
            ft = jnp.where(newly, ts.max_number, ft)
            fl = jnp.where(newly, ts.episode_steps, fl)
            return (new_state, done | ts.done, fs, ft, fl, ac), None

        keys = jax.random.split(key, steps_per_call)
        (state, done, fs, ft, fl, ac), _ = jax.lax.scan(
            body, (state, *carry), keys
        )
        return state, (done, fs, ft, fl, ac)

    chunk = jax.jit(chunk, static_argnums=0)

    remaining = num_games
    while remaining > 0:
        b = min(batch_size, remaining)
        fcfg = fastlib.for_backend(
            batch_size=b,
            backend=fast_backend,
            env_config=env_config,
        )
        key, k_reset = jax.random.split(key)
        state = fastlib.fast_reset(fcfg, k_reset, b)
        done = jnp.zeros((b,), bool)
        final_score = jnp.zeros((b,), jnp.int32)
        final_tile = jnp.zeros((b,), jnp.int32)
        final_len = jnp.zeros((b,), jnp.int32)
        act_counts = jnp.zeros((4,), jnp.int32)
        for _ in range(max_steps // steps_per_call + 1):
            key, k = jax.random.split(key)
            state, (done, final_score, final_tile, final_len, act_counts) = (
                chunk(
                    fcfg, policy.params, state,
                    (done, final_score, final_tile, final_len, act_counts), k,
                )
            )
            if bool(done.all()):
                break
        # Any game hitting max_steps records its current standing.
        live_boards = ps.from_cell_major(state.boards)
        final_score = jnp.where(done, final_score, state.score)
        final_tile = jnp.where(
            done, final_tile, board_ops.max_tile_value(live_boards)
        )
        final_len = jnp.where(done, final_len, state.episode_steps)
        scores.append(np.asarray(final_score))
        tiles.append(np.asarray(final_tile))
        lengths.append(np.asarray(final_len))
        action_counts += np.asarray(act_counts, np.int64)
        remaining -= b

    return EvalResult(
        scores=np.concatenate(scores),
        max_tiles=np.concatenate(tiles),
        lengths=np.concatenate(lengths),
        action_counts=action_counts,
    )


def _evaluate_fast_random(
    num_games, key, env_config, batch_size, max_steps, fast_backend
) -> EvalResult:
    """Random-policy eval on the multi-step rollout kernel.

    The uniform-over-legal policy is implemented IN the fused kernel
    (same distribution as random_legal_policy, kernel PRNG stream), so
    eval runs k=16 env steps per launch with the first-completion
    latches resident in VMEM (fastlib.fast_rollout_eval) — the
    1000-game random baseline becomes a handful of launches.

    Documented delta vs the reference's random mode (GameDemo.py:272-285):
    the reference samples uniformly over ALL 4 actions including illegal
    ones (``np.random.randint(0,4)``), burning turns on no-op moves; this
    path (like random_legal_policy) is uniform over LEGAL moves only, so
    episode-length/score distributions are not directly comparable to a
    reference random-mode transcript.
    """
    k_steps = 16
    scores: List[np.ndarray] = []
    tiles: List[np.ndarray] = []
    lengths: List[np.ndarray] = []
    action_counts = np.zeros(4, np.int64)

    remaining = num_games
    while remaining > 0:
        b = min(batch_size, remaining)
        fcfg = fastlib.for_backend(
            batch_size=b, backend=fast_backend, env_config=env_config
        )
        key, k_reset = jax.random.split(key)
        state = fastlib.fast_reset(fcfg, k_reset, b)
        latch = fastlib.eval_latch_init(b)
        for _ in range(max_steps // k_steps + 1):
            state, latch = fastlib.fast_rollout_eval(
                fcfg, state, latch, k_steps
            )
            if bool(np.asarray(latch.latched).all()):
                break
        # Lanes that never finished record their current standing
        # (same rule as the generic fast harness).
        done = np.asarray(latch.latched) != 0
        live_boards = ps.from_cell_major(state.boards)
        fscore = np.where(done, np.asarray(latch.score),
                          np.asarray(state.score))
        exp = np.asarray(latch.max_exp).astype(np.int32)
        ftile = np.where(
            done,
            np.where(exp > 0, np.left_shift(1, exp), 0),
            np.asarray(board_ops.max_tile_value(live_boards)),
        )
        flen = np.where(done, np.asarray(latch.steps),
                        np.asarray(state.episode_steps))
        scores.append(fscore)
        tiles.append(ftile)
        lengths.append(flen)
        action_counts += np.asarray(latch.action_counts, np.int64).sum(axis=1)
        remaining -= b

    return EvalResult(
        scores=np.concatenate(scores),
        max_tiles=np.concatenate(tiles),
        lengths=np.concatenate(lengths),
        action_counts=action_counts,
    )
