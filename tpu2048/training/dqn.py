"""Batched DQN actor-learner training driver.

TPU-native replacement for the reference's infinite episode loop
(/root/reference/Deep_QLearning/main_dir/mainDQL_CNN_step2.py:151-334).
Structural mapping (SURVEY.md §3.2):

* The reference steps ONE env, predicts per move (a device round-trip per
  action), and runs 100 replay updates when an episode ends
  (mainDQL:223-226). Here B envs step in lockstep inside a jit'd
  ``lax.scan``; the learner keeps the reference's EXACT update ratio via an
  update-debt scheduler: every completed episode adds
  ``updates_per_episode`` (default 100) to a debt counter, and each vector
  step drains up to ``max_updates_per_step`` of it with a dynamic-trip
  ``fori_loop``. Total gradient updates == 100 x episodes, exactly the
  reference regime at any episode length (the old fixed
  ``updates_per_step=8`` default was ~10x under the reference's ~39
  samples-learned per env step; it remains available for ablations).
* The driver's legal-move probing (mainDQL:170-174) is the env's pure
  ``legal_mask``; its "act_ripetitive when the last remember was a dedup
  skip" override (mainDQL:176-185) is the ``restrict_to_legal`` lane of
  :func:`tpu2048.agents.dqn.select_actions`.
* Terminal bonus shaping the reference does in the driver
  (mainDQL:202-213) lives in the env (``EnvConfig.terminal_bonus``).
* Periodic ops keyed on episodes (mainDQL:264-330): target sync @20,
  buffer prune @50 (10 worst episodes), full checkpoint @100, milestone
  model saves at 512/1024/2048 — executed between jitted chunks when the
  global episode counter crosses a boundary.
* The x0.98 LR decay on episodes ending at >=1024 (Dqn8:284-285,299-309)
  triggers at most once per vector step, like the reference's per-step
  hook (mainDQL:229).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
from flax import struct

from tpu2048.agents import dqn as dqnlib
from tpu2048.env import EnvConfig, EnvState, SIMPLE
from tpu2048.env import env as envlib
from tpu2048.env import fast as fastlib
from tpu2048.ops import board as board_ops
from tpu2048.ops import pallas_step as ps
from tpu2048.replay import sharded as replaylib


@dataclasses.dataclass(frozen=True)
class DQNTrainConfig:
    agent: dqnlib.DQNConfig = dqnlib.DQNConfig()
    env: EnvConfig = EnvConfig(reward=SIMPLE, terminal_bonus=True)
    num_envs: int = 128
    # Actor engine. "fast" = the fused Pallas step kernel
    # (tpu2048/ops/pallas_step.py) — the production hot path, valid for
    # SIMPLE-reward fixed (non-quirk) auto-reset semantics. "lax" = the
    # op-by-op env (tpu2048/env/env.py) — required for shaped rewards,
    # quirk-compat, and the trajectory-parity harness. "auto" picks "fast"
    # whenever the env semantics allow.
    engine: str = "auto"
    fast_backend: Optional[str] = None  # None=auto, "pallas", "lax" (oracle)
    # Learner schedule. Default (updates_per_step=None): the reference's
    # regime — ``updates_per_episode`` updates owed per completed episode
    # (100 replay calls at episode end, mainDQL:223-226), drained as the
    # episodes finish, capped at ``max_updates_per_step`` per vector step
    # (the residue carries over as debt). Setting ``updates_per_step``
    # switches to a fixed per-step count (ablations, cheap tests).
    updates_per_step: Optional[int] = None
    updates_per_episode: int = 100  # mainDQL:225
    max_updates_per_step: int = 512  # debt drained per vector step, max
    train_batch: int = 64  # Dqn8:249 batch_size
    steps_per_chunk: int = 16  # scan length per jit'd call
    replay_shards: int = 1  # data-parallel replay shards (devices)
    target_sync_episodes: int = 20  # mainDQL:274
    prune_episodes: int = 50  # mainDQL:318
    prune_n: int = 10  # mainDQL:320
    checkpoint_episodes: int = 100  # mainDQL:324
    epsilon_step_per_env: bool = True  # advance eps counter by B per step
    # Rollback-on-regression policy (the reference's commented block,
    # mainDQL:278-314; the paper confirms it was used).
    rollback: bool = False
    rollback_block: int = 20  # BLOCK_SIZE, mainDQL:109
    rollback_drop: float = 50.0  # avg max-tile drop triggering restore
    rollback_max_consecutive: int = 2  # mainDQL:292
    # Where block checkpoints live. "memory" (default) keeps a second
    # copy of the loop state resident in HBM (~1.6 GB for the full-size
    # model) so save/restore are device-side copies (~ms) — the
    # reference's 20-episode cadence is unusable with disk checkpoints
    # through a tunneled TPU runtime (40-140 s per 1.5 GB save). "disk"
    # uses Orbax named checkpoints (durable across crashes).
    rollback_store: str = "memory"
    prune_on_resume: int = 0  # drop N worst episodes after restore
    # (the reference's load_memory pruned 99, Dqn8:490-502)
    trace_env0: bool = False  # per-step debug trace of env 0 (the
    # reference's per-step CSV, mainDQL:22-25,234)
    # Failure detection (SURVEY §5): exit WATCHDOG_EXIT_CODE if no chunk
    # completes within this many seconds (0 = off). Turns a wedged device
    # call — which raises nothing and blocks forever — into a restartable
    # crash; pair with checkpointing + a --resume supervisor loop
    # (scripts/train_supervised.sh). Must exceed worst-case compile
    # (~90 s) + full-state checkpoint I/O (~140 s over a tunneled TPU).
    watchdog_timeout: float = 0.0
    # Stop as soon as best_tile reaches this value (0 = run the full
    # episode budget). Lets seed-band runs end at "first win" (the
    # reference's single published anchor is its first 2048, GameDemo.py:
    # 208) without budgeting a full-length run per seed.
    stop_at_tile: int = 0
    seed: int = 0


@struct.dataclass
class DQNLoopState:
    """Everything the training loop carries across jitted chunks."""

    env_state: EnvState  # or FastEnvState when the engine is "fast"
    dedup: dqnlib.DedupState
    buffer: replaylib.ReplayBuffer
    agent: dqnlib.DQNTrainState
    rng: jax.Array
    episodes_done: jax.Array  # () int32
    env_steps: jax.Array  # () int32
    update_debt: jax.Array  # () int32 — learner updates owed (debt mode)
    # Aggregates over finished episodes (running):
    sum_return: jax.Array  # () f32
    sum_score: jax.Array  # () f32
    sum_length: jax.Array  # () f32
    best_tile: jax.Array  # () int32
    sum_final_tile: jax.Array  # () f32 — sum of episode-final max tiles
    tile_hist: jax.Array  # (17,) int32 — final max-tile exponent histogram
    loss_sum: jax.Array  # () f32
    loss_count: jax.Array  # () int32
    last_loss: jax.Array  # () f32


def resolve_engine(config: DQNTrainConfig) -> str:
    """Pick the actor engine; validate an explicit "fast" request."""
    return fastlib.resolve_engine(config.env, config.engine)


def fast_config(config: DQNTrainConfig) -> fastlib.FastEnvConfig:
    """The FastEnvConfig the fast engine runs under for this train config."""
    return fastlib.for_backend(
        batch_size=config.num_envs,
        shards=config.replay_shards,
        backend=config.fast_backend,
        env_config=config.env,
    )


def init_loop_state(config: DQNTrainConfig):
    key = jax.random.PRNGKey(config.seed)
    k_env, k_agent, k_rng = jax.random.split(key, 3)
    model, agent_state = dqnlib.create_train_state(config.agent, k_agent)
    if resolve_engine(config) == "fast":
        env_state = fastlib.fast_reset(
            fast_config(config), k_env, config.num_envs
        )
    else:
        env_state = envlib.reset(config.env, k_env, config.num_envs)
    state = DQNLoopState(
        env_state=env_state,
        dedup=dqnlib.dedup_init(config.num_envs),
        buffer=replaylib.sharded_init(
            config.agent.memory_size, config.replay_shards
        ),
        agent=agent_state,
        rng=k_rng,
        episodes_done=jnp.zeros((), jnp.int32),
        env_steps=jnp.zeros((), jnp.int32),
        update_debt=jnp.zeros((), jnp.int32),
        sum_return=jnp.zeros((), jnp.float32),
        sum_score=jnp.zeros((), jnp.float32),
        sum_length=jnp.zeros((), jnp.float32),
        best_tile=jnp.zeros((), jnp.int32),
        sum_final_tile=jnp.zeros((), jnp.float32),
        tile_hist=jnp.zeros((17,), jnp.int32),
        loss_sum=jnp.zeros((), jnp.float32),
        loss_count=jnp.zeros((), jnp.int32),
        last_loss=jnp.zeros((), jnp.float32),
    )
    return model, state


def warm_start_state(
    state: DQNLoopState,
    directory: str,
    named: Optional[str] = None,
    step: Optional[int] = None,
) -> DQNLoopState:
    """Graft another run's LEARNED state onto a fresh loop state.

    Reproduces the reference's resumed-pretrained-lineage protocol: its
    run of record never starts from a cold network — the driver resumes a
    multi-part lineage (``resume = True; start_episode = 1900``,
    /root/reference/Deep_QLearning/main_dir/mainDQL_CNN_step2.py:124-126,
    133-139; shipped ``pretrain1/2.png`` artifacts), carrying the model
    weights, the whole replay memory, and the decayed epsilon/step_counter
    (Dqn8TestNOPERCNN.py:442-487) into a fresh episode count (the winning
    artifact is tagged episode 1,858 < the 1,900 resume point, so the
    episode counter restarted with the lineage intact).

    Carried from the source checkpoint: ``agent`` (online + target params,
    optimizer state incl. the decayed LR, epsilon step_counter,
    train_steps) and ``buffer`` (the replay memory, Dqn8:453-459).
    Fresh from ``state``: envs, dedup caches, RNG (the new run's seed),
    episode/env-step counters, update debt, and every metric accumulator —
    so ``episodes_done`` (and analyze's ``first_<tile>_by_episode``)
    counts episodes FROM THE RESUME POINT, directly comparable to the
    reference's 1,858 anchor. (``train_steps``/LR carry with the agent;
    the from-resume axes of record are episodes and env_steps.)

    ``named`` selects a named checkpoint (milestone tiers, e.g.
    ``tile_1024_ep7520``); otherwise ``step`` or the latest step. The
    source run must share the state-shaping config axes (num_envs, model
    dims, memory_size, replay_shards) — Orbax restores into ``state`` as
    the template and will refuse mismatched shapes.
    """
    from tpu2048.checkpoint import CheckpointManager

    mgr = CheckpointManager(directory)
    try:
        if named is not None:
            if not mgr.has_named(named):
                raise FileNotFoundError(
                    f"no named checkpoint {named!r} in {directory}"
                )
            restored = mgr.restore_named(named, state)
        else:
            s = step if step is not None else mgr.latest_step()
            if s is None:
                raise FileNotFoundError(
                    f"no step checkpoints in {directory}"
                )
            restored = mgr.restore(s, state)
    finally:
        mgr.close()
    return state.replace(agent=restored.agent, buffer=restored.buffer)


def train_chunk(config: DQNTrainConfig, model, tx, state: DQNLoopState,
                sharded_kernel=None):
    """``steps_per_chunk`` vectorized actor steps with interleaved learning.

    Jittable; donate ``state`` for in-place buffer updates. With the fast
    engine (resolve_engine) the actor runs on the fused Pallas step kernel —
    legality, merge, spawn, game-over, and auto-reset in one launch
    (pre-reset board + next legal mask emitted for replay/actor use); the
    lax engine keeps the op-by-op env for shaped/quirk/parity modes.
    ``sharded_kernel`` (from fastlib.make_sharded_kernel, need_legal=True)
    routes the fast step through shard_map on multi-device meshes.
    """
    acfg = config.agent
    b = config.num_envs
    engine = resolve_engine(config)
    fcfg = fast_config(config) if engine == "fast" else None

    def learner_round(carry):
        agent, buffer, rng, loss_sum = carry
        rng, k_sample = jax.random.split(rng)
        batch, indices, _ = replaylib.sharded_sample(
            buffer, k_sample, config.train_batch, acfg.alpha, acfg.beta
        )
        agent, metrics = dqnlib.train_step(acfg, model, tx, agent, batch)
        if acfg.alpha != 0.0:
            # |TD| -> priorities (Dqn8:389-390). At alpha=0 (uniform
            # sampling, the run of record) the priorities are never read
            # — skip the per-update scatter entirely. (Resuming an
            # alpha=0 checkpoint with alpha>0 then starts from flat
            # priorities, which is what its buffer would hold anyway.)
            buffer = replaylib.sharded_update_priorities(
                buffer, indices, metrics["td_errors"], acfg.priority_epsilon
            )
        return (agent, buffer, rng, loss_sum + metrics["loss"])

    def body(st: DQNLoopState, _):
        rng, k_act, k_learn = jax.random.split(st.rng, 3)

        # --- actor ---------------------------------------------------------
        # (named scopes group HLO for profiling, metrics/profiling.py)
        if engine == "fast":
            boards = ps.from_cell_major(st.env_state.boards)
            legal = st.env_state.legal  # kernel-emitted, never recomputed
        else:
            boards = st.env_state.board
            with jax.named_scope("actor"):
                legal = board_ops.legal_moves_mask(boards)
        eps = dqnlib.epsilon_value(acfg, st.agent.step_counter)
        actions = dqnlib.select_actions(
            model,
            st.agent.params,
            boards,
            legal,
            ~st.dedup.last_saved,
            eps,
            k_act,
        )
        if engine == "fast":
            with jax.named_scope("env_step_fused"):
                env_state, ts = fastlib.fast_step(
                    fcfg, st.env_state, actions,
                    need_obs=True, need_legal=True,
                    sharded_kernel=sharded_kernel,
                )
            next_boards = ps.from_cell_major(ts.obs)
        else:
            env_state, ts = envlib.step(config.env, st.env_state, actions)
            next_boards = ts.obs
        save, dedup = dqnlib.dedup_mask(
            st.dedup, boards, next_boards, ts.done, acfg.dedup
        )
        buffer = replaylib.sharded_add(
            st.buffer, boards, actions, ts.reward, ts.done, next_boards, save
        )
        agent = st.agent.replace(
            step_counter=st.agent.step_counter
            + (b if config.epsilon_step_per_env else 1)
        )
        # LR hook: x0.98 once per episode that ended with a >=1024
        # pre-step board (remember() checks np.max(state), Dqn8:284;
        # the flag is consumed once per episode, mainDQL:229). Count the
        # qualifying enders in this vector step and decay that many times.
        n_trigger = jnp.sum(
            (
                ts.done & (board_ops.max_tile_value(boards) >= acfg.lr_decay_tile)
            ).astype(jnp.int32)
        )
        agent = dqnlib.maybe_decay_lr(acfg, agent, n_trigger)

        # --- learner -------------------------------------------------------
        per_shard_batch = config.train_batch // config.replay_shards
        # The reference's replay() guard: skip (not defer) when the buffer
        # is under one batch or epsilon has not started decaying
        # (Dqn8:353-354).
        can_train = (jnp.min(buffer.size) >= per_shard_batch) & (eps < 1.0)

        if config.updates_per_step is not None:
            n_upd = jnp.where(
                can_train, jnp.int32(config.updates_per_step), 0
            )
            debt_after = st.update_debt
        else:
            # Update-debt schedule: each completed episode owes
            # ``updates_per_episode`` learner updates (mainDQL:223-226);
            # drain up to the per-step cap now, carry the residue.
            n_done = jnp.sum(ts.done).astype(jnp.int32)
            debt = st.update_debt + n_done * config.updates_per_episode
            n_upd = jnp.minimum(debt, config.max_updates_per_step)
            # Guard false -> updates are skipped like the reference's
            # early-return, not deferred.
            n_upd = jnp.where(can_train, n_upd, 0)
            debt_after = jnp.where(can_train, debt - n_upd, 0)

        with jax.named_scope("learner"):
            # Dynamic trip count (lowers to an XLA while loop): exactly
            # n_upd updates run, no masked-iteration waste.
            agent, buffer, _, loss_sum = jax.lax.fori_loop(
                0,
                n_upd,
                lambda i, c: learner_round(c),
                (agent, buffer, k_learn, jnp.float32(0.0)),
            )
            mean_loss = loss_sum / jnp.maximum(n_upd, 1).astype(jnp.float32)

        # --- metrics -------------------------------------------------------
        done_f = ts.done.astype(jnp.float32)
        final_exp = jnp.max(
            next_boards.reshape(b, 16), axis=-1
        ).astype(jnp.int32)
        hist_inc = jax.ops.segment_sum(
            ts.done.astype(jnp.int32), jnp.clip(final_exp, 0, 16), num_segments=17
        )
        ep_score = (
            st.env_state.score + ts.merge_score
        ).astype(jnp.float32)
        st = DQNLoopState(
            env_state=env_state,
            dedup=dedup,
            buffer=buffer,
            agent=agent,
            rng=rng,
            episodes_done=st.episodes_done + jnp.sum(ts.done).astype(jnp.int32),
            env_steps=st.env_steps + b,
            update_debt=debt_after,
            sum_return=st.sum_return + jnp.sum(ts.episode_return * done_f),
            sum_score=st.sum_score + jnp.sum(ep_score * done_f),
            sum_length=st.sum_length + jnp.sum(ts.episode_steps * done_f),
            best_tile=jnp.maximum(st.best_tile, jnp.max(ts.max_number)),
            sum_final_tile=st.sum_final_tile
            + jnp.sum(ts.max_number.astype(jnp.float32) * done_f),
            tile_hist=st.tile_hist + hist_inc,
            loss_sum=st.loss_sum + loss_sum,
            loss_count=st.loss_count + n_upd,
            last_loss=jnp.where(n_upd > 0, mean_loss, st.last_loss),
        )
        if config.trace_env0:
            # Per-step debug trace of env 0 — the reference's CSV columns
            # (action, legal moves, reward, total reward, state, done,
            # memory_saved, game_step; mainDQL:22-25,234).
            legal_bits = jnp.sum(
                legal[0].astype(jnp.int32) * jnp.asarray([1, 2, 4, 8]), axis=-1
            )
            trace = (
                actions[0],
                legal_bits,
                ts.reward[0],
                ts.episode_return[0],
                ts.done[0],
                save[0],
                ts.episode_steps[0],
                boards[0].reshape(16),
            )
        else:
            trace = ()
        return st, (eps, trace)

    state, (eps_trace, traces) = jax.lax.scan(
        body, state, None, length=config.steps_per_chunk
    )
    return state, eps_trace[-1], traces


def train(
    config: DQNTrainConfig,
    total_episodes: int,
    log_fn: Optional[Callable[[dict], None]] = None,
    checkpoint_fn: Optional[Callable[[DQNLoopState, int], None]] = None,
    milestone_fn: Optional[Callable[[DQNLoopState, int, int], None]] = None,
    state: Optional[DQNLoopState] = None,
    model=None,
    ckpt_manager=None,
    resume: bool = False,
    trace_fn: Optional[Callable[[list], None]] = None,
    mesh=None,
    model_parallel: int = 1,
) -> List[dict]:
    """Host loop with the reference's periodic-op cadence.

    ``checkpoint_fn(state, episode)`` fires every ``checkpoint_episodes``
    (mainDQL:323-330); ``milestone_fn(state, episode, tile)`` fires when a
    new best tile >= 512 appears (mainDQL:254-262 saves tiered models at
    512/1024/2048).

    With ``ckpt_manager`` (a :class:`tpu2048.checkpoint.CheckpointManager`)
    the loop additionally: restores the latest step when ``resume`` (the
    reference's resume path, mainDQL:124-139), saves the full loop state
    every ``checkpoint_episodes``, saves milestone checkpoints at new
    >=512 best tiles (mainDQL:254-262), and — when ``config.rollback`` —
    runs the block rollback policy (mainDQL:278-314): every
    ``rollback_block`` episodes compare the block's average final max tile
    with the previous block's; on a drop > ``rollback_drop`` restore the
    last block checkpoint (at most ``rollback_max_consecutive`` times in a
    row), else save a new block checkpoint.
    """
    tx = dqnlib.make_optimizer(config.agent)
    if state is None or model is None:
        model, state = init_loop_state(config)
    shardings = None
    if mesh is not None:
        # Multi-device: place the loop state on the (data, model) mesh
        # BEFORE any restore so the Orbax template carries shardings and
        # the restored arrays come back distributed.
        from tpu2048.parallel import dqn_loop_sharding, place_loop_state

        shardings = dqn_loop_sharding(state, mesh, model_parallel)
        state = place_loop_state(state, shardings)
    if ckpt_manager is not None and resume:
        latest = ckpt_manager.latest_step()
        if latest is not None:
            state = ckpt_manager.restore(latest, state)
            if config.prune_on_resume > 0:
                per_shard = max(
                    1, config.prune_on_resume // config.replay_shards
                )
                state = state.replace(
                    buffer=replaylib.sharded_prune(state.buffer, per_shard)
                )
    # With a mesh, pin in/out shardings on every jit whose output feeds
    # back into the loop state: the compiler may otherwise pick layouts
    # that disagree with the chunk's declared in_shardings on the next
    # call (see tpu2048/parallel/testkit.py for the same rule).
    def pin(in_sh, out_sh):
        if shardings is None:
            return {}
        return dict(in_shardings=(in_sh,), out_shardings=out_sh)

    sharded_kernel = None
    if mesh is not None and resolve_engine(config) == "fast":
        sharded_kernel = fastlib.make_sharded_kernel(
            fast_config(config), mesh, need_legal=True
        )
    chunk = jax.jit(
        lambda s: train_chunk(config, model, tx, s,
                              sharded_kernel=sharded_kernel),
        donate_argnums=0,
        **pin(shardings, (shardings, None, None)),
    )
    prune_per_shard = max(1, config.prune_n // config.replay_shards)
    prune = jax.jit(
        lambda buf: replaylib.sharded_prune(buf, prune_per_shard),
        donate_argnums=0,
        **pin(shardings.buffer if shardings else None, shardings.buffer if shardings else None),
    )
    sync = jax.jit(
        dqnlib.update_target,
        donate_argnums=0,
        **pin(shardings.agent if shardings else None, shardings.agent if shardings else None),
    )

    logs: List[dict] = []
    start_ep = int(state.episodes_done)
    prev = dict(ep=start_ep, ret=float(state.sum_return),
                score=float(state.sum_score), length=float(state.sum_length),
                loss=float(state.loss_sum), nloss=int(state.loss_count),
                t=time.time(), best=int(state.best_tile))
    last_sync = last_prune = last_ckpt = start_ep
    # Rollback bookkeeping (host-side, mainDQL:108-114).
    block = dict(
        idx=start_ep // max(config.rollback_block, 1),
        ep=start_ep,
        tiles=float(state.sum_final_tile),
        prev_avg=None,
        restored=0,
        rollbacks=0,
        mem=None,  # HBM-resident block checkpoint (rollback_store="memory")
    )
    env0_episode = 0
    watchdog = None
    if config.watchdog_timeout > 0:
        from tpu2048.utils.watchdog import STARTUP_FLOOR, Watchdog

        watchdog = Watchdog(
            config.watchdog_timeout, label="dqn",
            startup_floor=STARTUP_FLOOR,
        ).start()
    try:
        # Keyword args on purpose: several neighbors share a type
        # (last_sync/last_prune/last_ckpt, the three callbacks) and a
        # positional transposition would run while silently corrupting
        # cadences.
        return _train_loop(
            config=config, total_episodes=total_episodes, state=state,
            chunk=chunk, sync=sync, prune=prune, logs=logs, prev=prev,
            block=block, last_sync=last_sync, last_prune=last_prune,
            last_ckpt=last_ckpt, env0_episode=env0_episode, log_fn=log_fn,
            checkpoint_fn=checkpoint_fn, milestone_fn=milestone_fn,
            ckpt_manager=ckpt_manager, trace_fn=trace_fn, watchdog=watchdog,
        )
    finally:
        if watchdog is not None:
            watchdog.stop()


def _train_loop(
    config, total_episodes, state, chunk, sync, prune, logs, prev, block,
    last_sync, last_prune, last_ckpt, env0_episode, log_fn, checkpoint_fn,
    milestone_fn, ckpt_manager, trace_fn, watchdog,
):
    while int(state.episodes_done) < total_episodes:
        state, eps, traces = chunk(state)
        ep = int(state.episodes_done)
        if watchdog is not None:
            # int(...) above forced the device sync: the chunk really
            # finished, this is forward progress.
            watchdog.beat()
        if config.trace_env0 and trace_fn is not None:
            import numpy as _np

            cols = [_np.asarray(t) for t in traces]
            for i in range(len(cols[0])):
                legal = [a for a in range(4) if int(cols[1][i]) >> a & 1]
                trace_fn(
                    [
                        env0_episode,
                        int(cols[0][i]),
                        legal,
                        float(cols[2][i]),
                        float(cols[3][i]),
                        cols[7][i].tolist(),
                        bool(cols[4][i]),
                        bool(cols[5][i]),
                        int(cols[6][i]),
                    ]
                )
                if bool(cols[4][i]):
                    env0_episode += 1

        if ep // config.target_sync_episodes > last_sync // config.target_sync_episodes:
            state = state.replace(agent=sync(state.agent))
            last_sync = ep
        if ep // config.prune_episodes > last_prune // config.prune_episodes:
            if int(replaylib.total_size(state.buffer)) > config.train_batch:
                state = state.replace(buffer=prune(state.buffer))
            last_prune = ep
        best = int(state.best_tile)
        # Milestone saves at the reference's 512/1024/2048 tiers
        # (mainDQL:254-262 writes tiered model dirs at all three).
        if best >= 512 and best > prev["best"]:
            if milestone_fn:
                milestone_fn(state, ep, best)
            if ckpt_manager is not None:
                ckpt_manager.save_named(f"tile_{best}_ep{ep}", state)
                if watchdog is not None:
                    watchdog.beat()  # named saves are slow host I/O too
        prev["best"] = max(prev["best"], best)
        if ep // config.checkpoint_episodes > last_ckpt // config.checkpoint_episodes:
            if checkpoint_fn:
                checkpoint_fn(state, ep)
            if ckpt_manager is not None:
                ckpt_manager.save(ep, state)
            last_ckpt = ep
            if watchdog is not None:
                # Full-state saves move GBs (40-140 s over a tunneled
                # TPU); that's progress, not a hang.
                watchdog.beat()

        # Rollback-on-regression (mainDQL:278-314).
        use_mem = config.rollback_store == "memory"
        if (
            config.rollback
            and (use_mem or ckpt_manager is not None)
            and ep // config.rollback_block > block["idx"]
        ):
            block["idx"] = ep // config.rollback_block
            d_ep_blk = max(ep - block["ep"], 1)
            avg = (float(state.sum_final_tile) - block["tiles"]) / d_ep_blk
            has_backup = (
                block["mem"] is not None if use_mem
                else ckpt_manager.has_named("block_checkpoint")
            )
            if (
                block["prev_avg"] is not None
                and (block["prev_avg"] - avg) > config.rollback_drop
                and block["restored"] < config.rollback_max_consecutive
                and has_backup
            ):
                if use_mem:
                    # Hand a COPY to the training loop: the chunk donates
                    # its input buffers, and the backup must survive for
                    # the next (possibly consecutive) restore.
                    state = jax.tree.map(jnp.copy, block["mem"])
                else:
                    state = ckpt_manager.restore_named(
                        "block_checkpoint", state
                    )
                block["restored"] += 1
                block["rollbacks"] += 1
                ep = int(state.episodes_done)
                # Rewind the block index too: the next regression
                # comparison must fire one BLOCK_SIZE after the restored
                # episode, not after episodes_done re-crosses the
                # pre-restore boundary (which would average ~2 blocks and
                # dilute drop detection below rollback_drop).
                block["idx"] = ep // config.rollback_block
                # prev_avg intentionally kept (mainDQL:299).
                # Rewind the periodic-op bookkeeping to the restored
                # episode so target-sync/prune/checkpoint cadences re-fire
                # on schedule instead of skipping the replayed window.
                last_sync = min(last_sync, ep)
                last_prune = min(last_prune, ep)
                last_ckpt = min(last_ckpt, ep)
                # Refresh the row's best_tile too: the pre-restore value
                # would otherwise pair a rewound episode count with a tile
                # the restored state never held, corrupting analyze's
                # first_<tile>_by_episode milestones.
                best = int(state.best_tile)
                prev["best"] = best
                # Rewind the per-row delta baselines too: the restored
                # cumulative sums are older than prev's, and without this
                # the first post-restore row reports negative means.
                prev.update(
                    ep=ep,
                    ret=float(state.sum_return),
                    score=float(state.sum_score),
                    length=float(state.sum_length),
                    loss=float(state.loss_sum),
                    nloss=int(state.loss_count),
                )
            else:
                if use_mem:
                    block["mem"] = jax.tree.map(jnp.copy, state)
                else:
                    ckpt_manager.save_named("block_checkpoint", state)
                block["prev_avg"] = avg
                block["restored"] = 0
            block["ep"] = int(state.episodes_done)
            block["tiles"] = float(state.sum_final_tile)
            if watchdog is not None:
                # Disk-store block save/restore moves GBs; memory-store
                # copies are ms-scale but beating here is harmless.
                watchdog.beat()

        now = time.time()
        d_ep = max(ep - prev["ep"], 1)
        n_loss = int(state.loss_count)
        row = {
            "episodes": ep,
            "env_steps": int(state.env_steps),
            "epsilon": float(eps),
            "lr": float(dqnlib.current_lr(state.agent)),
            "buffer_size": int(replaylib.total_size(state.buffer)),
            "train_steps": int(state.agent.train_steps),
            "mean_return": (float(state.sum_return) - prev["ret"]) / d_ep,
            "mean_score": (float(state.sum_score) - prev["score"]) / d_ep,
            "mean_length": (float(state.sum_length) - prev["length"]) / d_ep,
            "best_tile": best,
            "loss": (float(state.loss_sum) - prev["loss"])
            / max(n_loss - prev["nloss"], 1),
            "tile_hist": [int(x) for x in state.tile_hist],
            "steps_per_s": config.num_envs
            * config.steps_per_chunk
            / max(now - prev["t"], 1e-9),
        }
        if config.rollback:
            row["rollbacks"] = block["rollbacks"]
        if config.updates_per_step is None:
            # Expose the learner backlog: in debt mode the regime promise
            # is exactly updates_per_episode x episodes total updates, and
            # a debt that grows without bound means max_updates_per_step
            # is too small for this env count (owed/step scales with
            # num_envs / episode_length).
            debt = int(state.update_debt)
            row["update_debt"] = debt
            if debt > 20 * config.max_updates_per_step and not prev.get(
                "debt_warned"
            ):
                prev["debt_warned"] = True
                print(
                    f"WARNING: learner debt {debt} updates and growing — "
                    f"max_updates_per_step={config.max_updates_per_step} "
                    f"cannot keep up with {config.num_envs} envs at "
                    f"updates_per_episode={config.updates_per_episode}; "
                    "the reference update ratio is not being met. Raise "
                    "max_updates_per_step or reduce --envs.",
                    flush=True,
                )
        prev.update(
            ep=ep,
            ret=float(state.sum_return),
            score=float(state.sum_score),
            length=float(state.sum_length),
            loss=float(state.loss_sum),
            nloss=n_loss,
            t=now,
        )
        logs.append(row)
        if log_fn:
            log_fn(row)
        if config.stop_at_tile and best >= config.stop_at_tile:
            # First-win (or first-milestone) early stop; the milestone
            # checkpoint above already captured the winning state, and
            # the final save below makes the run resumable if the band
            # later needs extending.
            break
    if ckpt_manager is not None and int(state.episodes_done) != last_ckpt:
        # Final save so short runs are resumable/evaluable.
        ckpt_manager.save(int(state.episodes_done), state, wait=True)
    return logs
