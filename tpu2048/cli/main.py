"""Command-line interface.

The reference README documents an intended CLI that was never built
(`python train.py --episodes 10000 --alpha 0.1 --gamma 0.99
--epsilon 0.95`, /root/reference/README.md:62-75) — every reference
hyperparameter is actually a hardcoded literal and resume is a code edit
(mainDQL_CNN_step2.py:124-126). This module delivers that UX, honoring the
README's flag names:

    python -m tpu2048 train tabular --episodes 10000 --alpha 0.1 ...
    python -m tpu2048 train dqn --episodes 2000 --checkpoint-dir runs/a --resume
    python -m tpu2048 eval --policy model --checkpoint-dir runs/a --games 1000
    python -m tpu2048 demo --mode random
    python -m tpu2048 plot --log runs/a/metrics.jsonl --out plots/run.png
    python -m tpu2048 bench
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys


def _save_run_config(args, directory: str) -> None:
    """Persist the model/env-shaping flags next to the checkpoints so
    eval/demo can rebuild the exact train state without repeating flags."""
    keys = [
        "gamma", "epsilon", "epsilon_min", "epsilon_decay", "batch", "envs",
        "updates_per_step", "updates_per_episode", "max_updates_per_step",
        "memory_size", "per_alpha", "no_dedup",
        "no_terminal_bonus", "features", "hidden", "blocks", "no_bf16",
        "steps_per_chunk", "replay_shards", "alpha", "engine", "seed",
    ]
    payload = {k: getattr(args, k) for k in keys if hasattr(args, k)}
    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, "config.json"), "w") as fh:
        json.dump(payload, fh, indent=2)


def _user_specified(args, dest: str) -> bool:
    """True if the flag for ``dest`` appeared explicitly on the command
    line (``--some-flag`` style or ``--flag=value``). Reads the argv the
    parser actually consumed (main() stashes it on the namespace), so
    programmatic ``main([...])`` calls behave like real invocations."""
    argv = getattr(args, "_argv", None)
    if argv is None:
        argv = sys.argv[1:]
    flag = "--" + dest.replace("_", "-")
    return any(a == flag or a.startswith(flag + "=") for a in argv)


def _load_run_config(args, directory: str):
    """Overlay a saved config.json (if present) onto the CLI args.

    Flags the user passed explicitly win over the saved config — e.g.
    ``eval --policy model --engine lax`` must actually run the lax
    engine for an A/B or parity-debug eval, even though the training
    run recorded ``engine`` in its config.json."""
    path = os.path.join(directory, "config.json")
    if not os.path.isfile(path):
        return args
    with open(path) as fh:
        payload = json.load(fh)
    for k, v in payload.items():
        if not _user_specified(args, k):
            setattr(args, k, v)
    return args


def _restore_config(args, directory: str):
    """The train config for building a checkpoint-restore TEMPLATE.

    The saved loop state's env-state TYPE follows the engine the run was
    trained with (FastEnvState vs EnvState), so the template must use the
    engine from config.json even when this eval/demo invocation overrides
    --engine for the rollout itself."""
    cfg = _dqn_config(args)
    path = os.path.join(directory, "config.json")
    if os.path.isfile(path):
        with open(path) as fh:
            # Runs trained before the fast engine existed have no
            # "engine" key; they stepped the lax env, so their saved
            # env-state is an EnvState and the template must say so.
            saved = json.load(fh).get("engine", "lax")
        if saved and saved != cfg.engine:
            cfg = dataclasses.replace(cfg, engine=saved)
    return cfg


def _add_tabular_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--episodes", type=int, default=200_000,
                   help="total training episodes (reference: 200k games)")
    p.add_argument("--alpha", type=float, default=0.1, help="learning rate")
    p.add_argument("--gamma", type=float, default=0.9, help="discount factor")
    p.add_argument("--epsilon", type=float, default=1.0,
                   help="initial exploration rate")
    p.add_argument("--epsilon-min", type=float, default=0.01)
    p.add_argument("--batch", type=int, default=1024, help="parallel envs")
    p.add_argument("--capacity-log2", type=int, default=25,
                   help="Q-table slots = 2**N")
    p.add_argument("--reward", choices=["shaped", "simple"], default="shaped")
    p.add_argument("--engine", choices=["auto", "fast", "lax"], default="auto",
                   help="actor engine: fast = fused Pallas step kernel "
                        "(simple reward only), lax = op-by-op env; auto "
                        "picks fast whenever the env semantics allow")
    p.add_argument("--table-backend",
                   choices=["auto", "pallas", "interpret", "xla", "legacy"],
                   default="auto",
                   help="Q-table backend: packed explicit-DMA kernels "
                        "(pallas, TPU default), their jnp twin (xla), or "
                        "the r4 two-array table (legacy)")
    p.add_argument("--steps-per-chunk", type=int, default=256)
    p.add_argument("--plot-every", type=int, default=0,
                   help="regenerate the 3-panel training plot every N "
                        "episodes (reference: 10, mainDQL:270; 0 = off)")
    p.add_argument("--save", type=str, default=None,
                   help="write the trained Q-table as .npz")
    p.add_argument("--log", type=str, default=None, help="JSONL metrics path")
    p.add_argument("--watchdog", type=float, default=0.0,
                   help="exit 70 if no training chunk completes within N "
                        "seconds (hang -> restartable crash; 0 = off)")
    p.add_argument("--seed", type=int, default=0)


def _add_dqn_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--episodes", type=int, default=2000)
    p.add_argument("--alpha", type=float, default=5e-5,
                   help="learning rate (Adam)")
    p.add_argument("--gamma", type=float, default=0.99)
    p.add_argument("--epsilon", type=float, default=0.9)
    p.add_argument("--epsilon-min", type=float, default=0.001)
    p.add_argument("--epsilon-decay", type=float, default=0.9999)
    p.add_argument("--batch", type=int, default=64,
                   help="learner batch size (reference: 64)")
    p.add_argument("--envs", type=int, default=128, help="parallel envs")
    p.add_argument("--updates-per-step", type=int, default=None,
                   help="FIXED learner updates per vector env step "
                        "(ablation mode; default: the reference's "
                        "updates-per-episode debt schedule)")
    p.add_argument("--updates-per-episode", type=int, default=100,
                   help="learner updates owed per completed episode "
                        "(reference: 100 replay calls at episode end, "
                        "mainDQL:225)")
    p.add_argument("--max-updates-per-step", type=int, default=512,
                   help="cap on debt drained per vector step")
    p.add_argument("--memory-size", type=int, default=50_000)
    p.add_argument("--per-alpha", type=float, default=0.0,
                   help="priority exponent (0 = uniform, reference default)")
    p.add_argument("--no-dedup", action="store_true",
                   help="disable the 2-back transition dedup")
    p.add_argument("--no-terminal-bonus", action="store_true")
    p.add_argument("--features", type=int, default=2048)
    p.add_argument("--hidden", type=int, default=1024)
    p.add_argument("--blocks", type=int, default=3)
    p.add_argument("--no-bf16", action="store_true")
    p.add_argument("--engine", choices=["auto", "fast", "lax"], default="auto",
                   help="actor engine: fast = fused Pallas step kernel "
                        "(simple reward only), lax = op-by-op env; auto "
                        "picks fast whenever the env semantics allow")
    p.add_argument("--steps-per-chunk", type=int, default=16)
    p.add_argument("--replay-shards", type=int, default=1)
    p.add_argument("--data-parallel", type=int, default=1,
                   help="shard envs/replay/batch over N mesh devices")
    p.add_argument("--model-parallel", type=int, default=1,
                   help="tensor-parallel CNN sharding over N mesh devices")
    p.add_argument("--coordinator", type=str, default=None,
                   help="multi-host coordinator address host:port "
                        "(jax.distributed.initialize)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--checkpoint-dir", type=str, default=None)
    p.add_argument("--checkpoint-every", type=int, default=100,
                   help="full state save every N episodes (mainDQL:324)")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint")
    p.add_argument("--prune-on-resume", type=int, default=0,
                   help="drop N worst episodes from replay after resume "
                        "(reference load_memory pruned 99)")
    p.add_argument("--warm-start", type=str, default=None, metavar="DIR",
                   help="checkpoint dir of ANOTHER run to warm-start from: "
                        "carries network/target/optimizer/epsilon/replay, "
                        "resets envs + episode counters + metrics — the "
                        "reference's resumed-pretrained-lineage protocol "
                        "(mainDQL:124-139). With --resume, an existing "
                        "checkpoint in --checkpoint-dir takes precedence "
                        "(supervisor restarts keep this run's own state).")
    p.add_argument("--warm-start-named", type=str, default=None,
                   metavar="NAME",
                   help="named checkpoint inside --warm-start (e.g. "
                        "tile_1024_ep7520); default = latest step")
    p.add_argument("--warm-start-step", type=int, default=None,
                   help="step checkpoint inside --warm-start "
                        "(default = latest)")
    p.add_argument("--rollback", action="store_true",
                   help="enable the block rollback-on-regression policy")
    p.add_argument("--rollback-store", choices=["memory", "disk"],
                   default="memory",
                   help="block checkpoints in HBM (ms-scale save/restore; "
                        "default) or as durable Orbax named checkpoints")
    p.add_argument("--rollback-block", type=int, default=20,
                   help="episodes per rollback comparison block "
                        "(reference BLOCK_SIZE, mainDQL:109)")
    p.add_argument("--rollback-drop", type=float, default=50.0,
                   help="avg final-max-tile drop vs the previous block "
                        "that triggers a restore (mainDQL:287)")
    p.add_argument("--plot-every", type=int, default=0,
                   help="regenerate the 3-panel training plot every N "
                        "episodes (reference: 10, mainDQL:270; 0 = off)")
    p.add_argument("--stop-at-tile", type=int, default=0,
                   help="stop the run once best_tile reaches this value "
                        "(0 = full episode budget); seed-band runs use "
                        "2048 to end at first win")
    p.add_argument("--debug-csv", type=str, default=None,
                   help="per-step CSV trace of env 0 (reference debug log)")
    p.add_argument("--log", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)


def _tabular_config(args):
    from tpu2048.agents.tabular import TabularConfig
    from tpu2048.env import EnvConfig
    from tpu2048.training.tabular import TabularTrainConfig

    return TabularTrainConfig(
        agent=TabularConfig(
            learning_rate=args.alpha,
            discount=args.gamma,
            exploration_rate=args.epsilon,
            exploration_min=args.epsilon_min,
            total_epochs=max(args.episodes // args.batch, 1),
            capacity_log2=args.capacity_log2,
        ),
        env=EnvConfig(reward=args.reward),
        batch_size=args.batch,
        total_episodes=args.episodes,
        steps_per_chunk=args.steps_per_chunk,
        engine=getattr(args, "engine", "auto"),
        table_backend=getattr(args, "table_backend", "auto"),
        watchdog_timeout=getattr(args, "watchdog", 0.0) or 0.0,
        seed=args.seed,
    )


def _dqn_config(args):
    from tpu2048.agents.dqn import DQNConfig
    from tpu2048.env import EnvConfig, SIMPLE
    from tpu2048.training.dqn import DQNTrainConfig

    return DQNTrainConfig(
        agent=DQNConfig(
            gamma=args.gamma,
            epsilon=args.epsilon,
            epsilon_min=args.epsilon_min,
            epsilon_decay=args.epsilon_decay,
            batch_size=args.batch,
            memory_size=args.memory_size,
            alpha=args.per_alpha,
            learning_rate=args.alpha,
            dedup=not args.no_dedup,
            features=args.features,
            hidden=args.hidden,
            num_blocks=args.blocks,
            bf16=not args.no_bf16,
        ),
        env=EnvConfig(
            reward=SIMPLE, terminal_bonus=not args.no_terminal_bonus
        ),
        num_envs=args.envs,
        engine=getattr(args, "engine", "auto"),
        updates_per_step=args.updates_per_step,
        updates_per_episode=getattr(args, "updates_per_episode", 100),
        max_updates_per_step=getattr(args, "max_updates_per_step", 512),
        train_batch=args.batch,
        steps_per_chunk=args.steps_per_chunk,
        replay_shards=args.replay_shards,
        checkpoint_episodes=getattr(args, "checkpoint_every", 100),
        rollback=args.rollback,
        rollback_store=getattr(args, "rollback_store", "memory"),
        rollback_block=getattr(args, "rollback_block", 20),
        rollback_drop=getattr(args, "rollback_drop", 50.0),
        prune_on_resume=getattr(args, "prune_on_resume", 0),
        trace_env0=bool(getattr(args, "debug_csv", None)),
        watchdog_timeout=getattr(args, "watchdog", 0.0) or 0.0,
        stop_at_tile=getattr(args, "stop_at_tile", 0),
        seed=args.seed,
    )


def cmd_train(args) -> int:
    if getattr(args, "coordinator", None):
        # Multi-host bring-up must precede logger construction so the
        # host-0 gating in JSONLLogger sees the right process_index.
        from tpu2048.parallel import distributed_init

        distributed_init(
            args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    from tpu2048.metrics import JSONLLogger

    logger = JSONLLogger(args.log)
    log_fn = logger.log
    plot_every = getattr(args, "plot_every", 0)
    if plot_every and not args.log:
        print("--plot-every requires --log (plots render from the JSONL "
              "rows); ignoring", file=sys.stderr)
    if plot_every and args.log and logger.enabled:
        # The reference regenerates its 3-panel PNG during training every
        # 10 episodes (mainDQL:270-271); here it is an opt-in log_fn hook
        # so matplotlib stays out of the training library. Host-0 only
        # (logger.enabled), and re-read from the JSONL file so a resumed
        # run's plot keeps its pre-resume history.
        from tpu2048.metrics.logging import plot_from_jsonl

        out_png = os.path.splitext(args.log)[0] + ".png"
        last_plot = [0]

        def log_fn(row, _log=logger.log):  # noqa: F811
            _log(row)
            if row.get("episodes", 0) >= last_plot[0] + plot_every:
                last_plot[0] = row["episodes"]
                plot_from_jsonl(args.log, out_png)

    try:
        if args.algo == "tabular":
            from tpu2048.training.tabular import train

            train(
                _tabular_config(args),
                log_fn=log_fn,
                save_path=getattr(args, "save", None),
            )
        else:
            from tpu2048.training.dqn import train

            dp = getattr(args, "data_parallel", 1)
            if dp > 1 and args.replay_shards % dp != 0:
                if args.replay_shards != 1:
                    print(
                        f"--replay-shards {args.replay_shards} must be a "
                        f"multiple of --data-parallel {dp}", file=sys.stderr
                    )
                    return 2
                # Replay shards live on the data axis; one shard per
                # data-parallel device keeps transitions device-local.
                # This must happen BEFORE _save_run_config so eval/demo
                # rebuild the same buffer shape from config.json.
                args.replay_shards = dp
            mgr = None
            if args.checkpoint_dir:
                from tpu2048.checkpoint import CheckpointManager

                mgr = CheckpointManager(args.checkpoint_dir)
                _save_run_config(args, args.checkpoint_dir)
            trace_logger = None
            trace_fn = None
            if getattr(args, "debug_csv", None):
                from tpu2048.metrics import CSVLogger

                # The reference driver's header (mainDQL:137).
                trace_logger = CSVLogger(
                    args.debug_csv,
                    ["Episode", "Action", "Legal Moves", "Reward",
                     "Total Reward", "State", "Done", "Ho salvato", "Mosse"],
                )
                trace_fn = trace_logger.log
            mesh = None
            mp = getattr(args, "model_parallel", 1)
            if dp * mp > 1:
                from tpu2048.parallel import MeshConfig, create_mesh

                mesh = create_mesh(
                    MeshConfig(data_parallel=dp, model_parallel=mp)
                )
            cfg = _dqn_config(args)
            model = state = None
            ws = getattr(args, "warm_start", None)
            if ws:
                # Skip the (expensive) warm restore when a supervisor
                # restart will resume from this run's own checkpoints
                # anyway — the lineage is already baked into them.
                own_ckpt = (
                    args.resume and mgr is not None
                    and mgr.latest_step() is not None
                )
                if not own_ckpt:
                    from tpu2048.training.dqn import (
                        init_loop_state,
                        warm_start_state,
                    )

                    model, state = init_loop_state(cfg)
                    try:
                        state = warm_start_state(
                            state, ws,
                            named=getattr(args, "warm_start_named", None),
                            step=getattr(args, "warm_start_step", None),
                        )
                    except FileNotFoundError as e:
                        # A missing warm-start source never fixes itself:
                        # exit 2 (the usage-error code train_supervised.sh
                        # treats as permanent) instead of 1, so a
                        # supervisor doesn't crash-loop 20 restarts
                        # against a deleted checkpoint directory.
                        print(f"error: --warm-start: {e}", file=sys.stderr)
                        return 2
            train(
                cfg,
                total_episodes=args.episodes,
                log_fn=log_fn,
                ckpt_manager=mgr,
                resume=args.resume,
                trace_fn=trace_fn,
                mesh=mesh,
                model_parallel=mp,
                state=state,
                model=model,
            )
            if mgr:
                mgr.close()
            if trace_logger:
                trace_logger.close()
    finally:
        logger.close()
    return 0


def cmd_eval(args) -> int:
    import jax

    from tpu2048.eval import evaluate, greedy_dqn_policy, random_legal_policy

    if args.policy == "random":
        policy = random_legal_policy()
    elif args.policy == "tabular":
        if not args.table:
            print("--table required for --policy tabular", file=sys.stderr)
            return 2
        policy = _tabular_policy(args.table)
    elif args.policy == "model":
        if not args.checkpoint_dir:
            print("--checkpoint-dir required for --policy model", file=sys.stderr)
            return 2
        from tpu2048.checkpoint import restore_params_only
        from tpu2048.models.dqn import create_model

        args = _load_run_config(args, args.checkpoint_dir)
        cfg = _restore_config(args, args.checkpoint_dir)
        try:
            step, params = restore_params_only(
                args.checkpoint_dir, args.step, cfg,
                named=getattr(args, "named", None),
            )
        except FileNotFoundError as e:
            print(e, file=sys.stderr)
            return 2
        if params is None:
            print("no checkpoint found", file=sys.stderr)
            return 2
        model = create_model(cfg.agent)
        policy = greedy_dqn_policy(model, params)
    else:
        print(f"unknown policy {args.policy}", file=sys.stderr)
        return 2

    from tpu2048.env import EnvConfig

    result = evaluate(
        policy,
        num_games=args.games,
        key=jax.random.PRNGKey(args.seed),
        env_config=EnvConfig(
            reward=getattr(args, "reward", "simple"), auto_reset=False
        ),
        batch_size=args.eval_batch,
        engine=getattr(args, "engine", "auto"),
    )
    print(json.dumps(result.summary(), indent=2))
    return 0


def _tabular_policy(table_path: str):
    from tpu2048.agents.tabular import load_qtable
    from tpu2048.eval import greedy_tabular_policy

    return greedy_tabular_policy(load_qtable(table_path))


def _demo_policy(args):
    """Load the greedy model policy for demo/gui model mode (or None)."""
    if args.mode != "model":
        return None
    if getattr(args, "table", None):
        return _tabular_policy(args.table)
    if not args.checkpoint_dir:
        raise SystemExit(
            "--mode model requires --checkpoint-dir (a trained DQN) or "
            "--table (a trained tabular Q-table)"
        )
    from tpu2048.checkpoint import restore_params_only
    from tpu2048.eval import greedy_dqn_policy
    from tpu2048.models.dqn import create_model

    args = _load_run_config(args, args.checkpoint_dir)
    cfg = _restore_config(args, args.checkpoint_dir)
    try:
        step, params = restore_params_only(
            args.checkpoint_dir, args.step, cfg,
            named=getattr(args, "named", None),
        )
    except FileNotFoundError as e:
        raise SystemExit(str(e))
    if params is None:
        raise SystemExit(f"no checkpoint found in {args.checkpoint_dir}")
    model = create_model(cfg.agent)
    return greedy_dqn_policy(model, params)


def cmd_demo(args) -> int:
    from tpu2048.eval.demo import play

    stats = play(mode=args.mode, policy=_demo_policy(args), delay=args.delay,
                 seed=args.seed)
    print(json.dumps(stats))
    return 0


def cmd_gui(args) -> int:
    from tpu2048.eval.gui import run_gui

    stats = run_gui(mode=args.mode, policy=_demo_policy(args),
                    delay_ms=int(args.delay * 1000), seed=args.seed)
    print(json.dumps(stats))
    return 0


def cmd_analyze(args) -> int:
    from tpu2048.metrics.analyze import main as analyze_main

    analyze_main(args.log)
    return 0


def cmd_plot(args) -> int:
    from tpu2048.metrics import plot_from_jsonl

    plot_from_jsonl(args.log, args.out)
    print(f"wrote {args.out}")
    return 0


def cmd_bench(args) -> int:
    import bench as _bench  # repo-root bench.py

    if args.learner:
        _bench.learner_main(batch=args.train_batch, updates=args.updates)
    elif args.train_loop:
        _bench.train_loop_main(envs=args.envs)
    elif args.tabular:
        _bench.tabular_main(batch=args.batch if _user_specified(args, "batch")
                            else 4096)
    elif args.scale:
        _bench.scale_main([int(x) for x in args.scale.split(",")])
    else:
        _bench.main(batch=args.batch, steps=args.steps)
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="train2048",
        description="TPU-native 2048 RL framework (tpu2048)",
        # No prefix abbreviations: _user_specified decides config.json
        # overlay precedence by scanning argv for the literal flag, and an
        # abbreviated spelling (--eng lax) would silently lose to the
        # saved config.
        allow_abbrev=False,
    )
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (debugging)")
    sub = p.add_subparsers(dest="command", required=True)

    pt = sub.add_parser("train", help="train an agent", allow_abbrev=False)
    st = pt.add_subparsers(dest="algo", required=True)
    ptab = st.add_parser("tabular", help="tabular Q-learning (QLearningBase)", allow_abbrev=False)
    _add_tabular_args(ptab)
    ptab.set_defaults(fn=cmd_train)
    pdqn = st.add_parser("dqn", help="DQN (Deep_QLearning)", allow_abbrev=False)
    _add_dqn_args(pdqn)
    # Train-only (eval/demo/gui share _add_dqn_args for model/restore
    # flags but have no training loop to supervise):
    pdqn.add_argument(
        "--watchdog", type=float, default=0.0,
        help="exit 70 if no training chunk completes within N seconds "
             "(hang -> restartable crash; pair with --resume supervision, "
             "scripts/train_supervised.sh; must exceed worst-case compile "
             "+ checkpoint I/O, >=900 recommended on a tunneled TPU; "
             "0 = off)")
    pdqn.set_defaults(fn=cmd_train)

    pe = sub.add_parser("eval", help="batched greedy/random evaluation", allow_abbrev=False)
    _add_dqn_args(pe)
    pe.add_argument("--policy", choices=["random", "model", "tabular"],
                    default="random")
    pe.add_argument("--table", type=str, default=None,
                    help="Q-table .npz for --policy tabular")
    pe.add_argument("--games", type=int, default=512)
    pe.add_argument("--eval-batch", type=int, default=512)
    pe.add_argument("--reward", choices=["simple", "shaped"],
                    default="simple",
                    help="env regime to evaluate under: simple "
                         "(Deep_QLearning) or shaped (QLearningBase — "
                         "random eval runs on the shaped rollout kernel)")
    pe.add_argument("--step", type=int, default=None)
    pe.add_argument("--named", type=str, default=None,
                    help="load a NAMED checkpoint (milestone tile_512_*/"
                         "tile_1024_*/tile_2048_* or block_checkpoint) "
                         "instead of a step")
    pe.set_defaults(fn=cmd_eval)

    pd = sub.add_parser("demo", help="terminal play: manual/random/model", allow_abbrev=False)
    _add_dqn_args(pd)
    pd.add_argument("--table", type=str, default=None,
                    help="play a trained tabular Q-table instead of a DQN")
    pd.add_argument("--mode", choices=["manual", "random", "model"],
                    default="manual")
    pd.add_argument("--delay", type=float, default=0.5)
    pd.add_argument("--step", type=int, default=None)
    pd.add_argument("--named", type=str, default=None,
                    help="load a NAMED checkpoint (e.g. a tile_* milestone)")
    pd.set_defaults(fn=cmd_demo)

    pg = sub.add_parser("gui", help="Tkinter play: manual/random/model", allow_abbrev=False)
    _add_dqn_args(pg)
    pg.add_argument("--table", type=str, default=None,
                    help="play a trained tabular Q-table instead of a DQN")
    pg.add_argument("--mode", choices=["manual", "random", "model"],
                    default="manual")
    pg.add_argument("--delay", type=float, default=0.5)
    pg.add_argument("--step", type=int, default=None)
    pg.add_argument("--named", type=str, default=None,
                    help="load a NAMED checkpoint (e.g. a tile_* milestone)")
    pg.set_defaults(fn=cmd_gui)

    pp = sub.add_parser("plot", help="render training plots from JSONL logs", allow_abbrev=False)
    pp.add_argument("--log", type=str, required=True)
    pp.add_argument("--out", type=str, required=True)
    pp.set_defaults(fn=cmd_plot)

    pa = sub.add_parser("analyze",
                        help="milestone timings + win stats from a "
                             "metrics.jsonl (reference-comparable numbers)", allow_abbrev=False)
    pa.add_argument("--log", type=str, required=True)
    pa.set_defaults(fn=cmd_analyze)

    pb = sub.add_parser("bench", help="throughput benchmarks", allow_abbrev=False)
    pb.add_argument("--batch", type=int, default=65536)
    pb.add_argument("--steps", type=int, default=256)
    pb.add_argument("--learner", action="store_true",
                    help="benchmark DQN learner updates/s (full-size CNN) "
                    "instead of env steps/s")
    pb.add_argument("--train-loop", action="store_true",
                    help="benchmark the real DQN training chunk's "
                    "actor-side env steps/s (full-size CNN policy)")
    pb.add_argument("--tabular", action="store_true",
                    help="benchmark the tabular training chunk's env "
                    "steps/s (shaped env + hashed Q-table)")
    pb.add_argument("--scale", type=str, default=None,
                    help="comma-separated device counts for the DP "
                    "scaling bench (e.g. 1,2,4,8)")
    pb.add_argument("--train-batch", type=int, default=64)
    pb.add_argument("--updates", type=int, default=200)
    pb.add_argument("--envs", type=int, default=128,
                    help="env count for --train-loop")
    pb.set_defaults(fn=cmd_bench)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    # Stash the consumed argv so "did the user explicitly pass this flag"
    # checks work for programmatic main([...]) calls too.
    args._argv = list(sys.argv[1:] if argv is None else argv)
    if getattr(args, "cpu", False):
        import jax

        # Must happen before any backend initializes; overrides this
        # machine's sitecustomize-forced platform list.
        jax.config.update("jax_platforms", "cpu")
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
