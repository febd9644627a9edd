"""Batched tabular Q-learning training driver.

TPU-native replacement for the reference's episode loop
(/root/reference/QLearningBase/Agent/main.py:59-115): instead of one serial
episode at a time, B environments run in lockstep under a jit'd
``lax.scan``; the Q-table updates by batched scatter each step; epsilon
decays on the reference's per-episode schedule with "epoch" defined as
completed-episodes / B so the decay rate matches in episode units.

The reference's per-episode CSV debug log (Agent/main.py:59-62) maps to the
aggregated per-chunk metrics this driver emits (episodes, mean return, mean
score, best tile, action distribution — the action histogram mirrors the
summary_statistics_cleaned.csv columns).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
from flax import struct

from tpu2048.agents import tabular as tab
from tpu2048.agents import tabular_fast as tabf
from tpu2048.env import EnvConfig, EnvState, SHAPED
from tpu2048.env import env as envlib
from tpu2048.env import fast as fastlib
from tpu2048.ops import pallas_step as ps


@dataclasses.dataclass(frozen=True)
class TabularTrainConfig:
    agent: tab.TabularConfig = tab.TabularConfig()
    env: EnvConfig = EnvConfig(reward=SHAPED)
    batch_size: int = 1024
    total_episodes: int = 200_000  # reference trained 200k games (2048.pdf §5.1)
    steps_per_chunk: int = 256  # scan length per jit'd call
    # Actor engine: "fast" = the fused Pallas step kernel (simple-reward
    # fixed semantics only); "lax" = the op-by-op env (required for the
    # shaped reward's stall counters / prev-max bonuses); "auto" picks.
    engine: str = "auto"
    fast_backend: Optional[str] = None  # None=auto, "pallas", "lax" (oracle)
    # Q-table backend. "auto": the packed explicit-DMA table on TPU
    # ("pallas", ops/table_kernel.py), its bit-exact jnp twin elsewhere
    # ("xla"). "interpret" runs the real kernels interpreted (tests).
    # "legacy" keeps the r4 two-array table (agents/tabular.py ops) — the
    # differential oracle and the path eval .npz files flow through.
    table_backend: str = "auto"
    # Failure detection: exit WATCHDOG_EXIT_CODE if no chunk completes in
    # this many seconds (0 = off); see tpu2048/utils/watchdog.py.
    watchdog_timeout: float = 0.0
    seed: int = 0


def resolve_engine(config: TabularTrainConfig) -> str:
    """Pick the actor engine; validate an explicit "fast" request."""
    return fastlib.resolve_engine(config.env, config.engine)


def resolve_table_backend(config: TabularTrainConfig) -> str:
    """Pick the Q-table backend (see TabularTrainConfig.table_backend)."""
    tb = config.table_backend
    if tb == "auto":
        return "pallas" if jax.default_backend() != "cpu" else "xla"
    if tb not in ("pallas", "interpret", "xla", "legacy"):
        raise ValueError(f"unknown table_backend {tb!r}")
    return tb


def fast_config(config: TabularTrainConfig) -> fastlib.FastEnvConfig:
    return fastlib.for_backend(
        batch_size=config.batch_size,
        backend=config.fast_backend,
        env_config=config.env,
    )


@struct.dataclass
class TabularTrainState:
    table: tab.QTable
    env_state: EnvState
    rng: jax.Array
    episodes_done: jax.Array  # () int32
    env_steps: jax.Array  # () int32
    # Aggregates over finished episodes (running, never reset):
    sum_return: jax.Array  # () f32
    sum_score: jax.Array  # () f32
    sum_length: jax.Array  # () f32
    best_tile: jax.Array  # () int32
    action_counts: jax.Array  # (4,) int32


def init_train_state(config: TabularTrainConfig) -> TabularTrainState:
    key = jax.random.PRNGKey(config.seed)
    k_env, k_rng = jax.random.split(key)
    # Note: every zero leaf is a fresh array (no aliasing) so the state can
    # be donated to jitted chunks.
    if resolve_engine(config) == "fast":
        env_state = fastlib.fast_reset(
            fast_config(config), k_env, config.batch_size
        )
    else:
        env_state = envlib.reset(config.env, k_env, config.batch_size)
    if resolve_table_backend(config) == "legacy":
        table = tab.qtable_init(config.agent.capacity_log2)
    else:
        table = tabf.packed_init(config.agent.capacity_log2)
    return TabularTrainState(
        table=table,
        env_state=env_state,
        rng=k_rng,
        episodes_done=jnp.zeros((), jnp.int32),
        env_steps=jnp.zeros((), jnp.int32),
        sum_return=jnp.zeros((), jnp.float32),
        sum_score=jnp.zeros((), jnp.float32),
        sum_length=jnp.zeros((), jnp.float32),
        best_tile=jnp.zeros((), jnp.int32),
        action_counts=jnp.zeros((4,), jnp.int32),
    )


def train_chunk(config: TabularTrainConfig, state: TabularTrainState):
    """Run ``steps_per_chunk`` vectorized env steps with learning. Jittable."""
    agent_cfg = config.agent
    env_cfg = config.env
    b = config.batch_size

    engine = resolve_engine(config)
    fcfg = fast_config(config) if engine == "fast" else None
    tbk = resolve_table_backend(config)

    def body(st: TabularTrainState, _):
        rng, k_act = jax.random.split(st.rng)
        epoch = st.episodes_done.astype(jnp.float32) / b
        eps = tab.epsilon_for_epoch(epoch, agent_cfg)
        if engine == "fast":
            boards = ps.from_cell_major(st.env_state.boards)
        else:
            boards = st.env_state.board
        if tbk == "legacy":
            actions, probe = tab.choose_actions_probed(
                st.table, boards, eps, k_act
            )
        else:
            actions, probe = tabf.fast_choose_actions_probed(
                st.table, boards, eps, k_act, backend=tbk
            )
        if engine == "fast":
            env_state, ts = fastlib.fast_step(
                fcfg, st.env_state, actions, need_obs=True
            )
            next_boards = ps.from_cell_major(ts.obs)
        else:
            env_state, ts = envlib.step(env_cfg, st.env_state, actions)
            next_boards = ts.obs
        if tbk == "legacy":
            targets = tab.q_learning_targets(
                st.table, ts.reward, next_boards, ts.done, agent_cfg.discount
            )
            table = tab.qtable_update(
                st.table, boards, actions, targets, agent_cfg.learning_rate,
                probe=probe,
            )
        else:
            targets = tabf.fast_targets(
                st.table, ts.reward, next_boards, ts.done,
                agent_cfg.discount, backend=tbk,
            )
            table = tabf.fast_update(
                st.table, probe, actions, targets, agent_cfg.learning_rate,
                backend=tbk,
            )
        done_f = ts.done.astype(jnp.float32)
        st = TabularTrainState(
            table=table,
            env_state=env_state,
            rng=rng,
            episodes_done=st.episodes_done + jnp.sum(ts.done).astype(jnp.int32),
            env_steps=st.env_steps + b,
            sum_return=st.sum_return + jnp.sum(ts.episode_return * done_f),
            sum_score=st.sum_score
            + jnp.sum(jnp.where(ts.done, _episode_score(st, ts), 0.0)),
            sum_length=st.sum_length + jnp.sum(ts.episode_steps * done_f),
            best_tile=jnp.maximum(st.best_tile, jnp.max(ts.max_number)),
            action_counts=st.action_counts
            + jnp.sum(
                jax.nn.one_hot(actions, 4, dtype=jnp.int32), axis=0
            ),
        )
        return st, eps

    state, eps_trace = jax.lax.scan(
        body, state, None, length=config.steps_per_chunk
    )
    return state, eps_trace[-1]


def _episode_score(st: TabularTrainState, ts) -> jax.Array:
    """Episode cumulative merge score at termination.

    ``EnvState.score`` resets on auto-reset, so read it from the pre-step
    state plus this step's merge score.
    """
    return (
        st.env_state.score.astype(jnp.float32)
        + ts.merge_score.astype(jnp.float32)
    )


def train(
    config: TabularTrainConfig,
    log_fn: Optional[Callable[[dict], None]] = None,
    save_path: Optional[str] = None,
) -> List[dict]:
    """Host loop: run jitted chunks until ``total_episodes`` finish.

    Returns the list of per-chunk metric dicts (also passed to ``log_fn``).
    With ``save_path`` the final Q-table is written as .npz (the reference
    had no tabular persistence at all; see agents/tabular.save_qtable).
    """
    chunk = jax.jit(lambda s: train_chunk(config, s))
    state = init_train_state(config)
    logs: List[dict] = []
    prev = dict(ep=0, ret=0.0, score=0.0, length=0.0, t=time.time())
    watchdog = None
    if config.watchdog_timeout > 0:
        from tpu2048.utils.watchdog import STARTUP_FLOOR, Watchdog

        watchdog = Watchdog(
            config.watchdog_timeout, label="tabular",
            startup_floor=STARTUP_FLOOR,
        ).start()
    try:
        return _train_loop(
            config, chunk, state, logs, prev, watchdog, log_fn, save_path
        )
    finally:
        # Always reap the watchdog thread: if chunk() raises and the
        # embedding process (a pytest session, a sweep driver) catches
        # the exception and keeps running, a leaked watchdog would
        # os._exit(70) it once the timeout elapsed.
        if watchdog is not None:
            watchdog.stop()


def _train_loop(config, chunk, state, logs, prev, watchdog, log_fn,
                save_path):
    while int(state.episodes_done) < config.total_episodes:
        state, eps = chunk(state)
        ep = int(state.episodes_done)
        if watchdog is not None:
            watchdog.beat()
        now = time.time()
        d_ep = max(ep - prev["ep"], 1)
        row = {
            "episodes": ep,
            "env_steps": int(state.env_steps),
            "epsilon": float(eps),
            "mean_return": (float(state.sum_return) - prev["ret"]) / d_ep,
            "mean_score": (float(state.sum_score) - prev["score"]) / d_ep,
            "mean_length": (float(state.sum_length) - prev["length"]) / d_ep,
            "best_tile": int(state.best_tile),
            "q_states": int(jnp.sum(state.table.occupied)),
            "dropped_updates": int(state.table.dropped),
            "action_counts": [int(x) for x in state.action_counts],
            "steps_per_s": config.batch_size
            * config.steps_per_chunk
            / max(now - prev["t"], 1e-9),
        }
        prev = dict(
            ep=ep,
            ret=float(state.sum_return),
            score=float(state.sum_score),
            length=float(state.sum_length),
            t=now,
        )
        logs.append(row)
        if log_fn:
            log_fn(row)
    if save_path:
        table = state.table
        if isinstance(table, tabf.PackedQTable):
            # .npz files stay in the canonical two-array layout so eval
            # (`--policy tabular`) and older tables interoperate.
            table = tabf.unpack_qtable(table)
        tab.save_qtable(save_path, table)
    return logs
