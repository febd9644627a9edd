"""Eval harness, terminal demo, and CLI tests."""

import io
import json

import jax
import numpy as np

from tpu2048.cli.main import main as cli_main
from tpu2048.eval import evaluate, random_legal_policy
from tpu2048.eval.demo import play, render_board
from tpu2048.ops import values_to_exponents
import jax.numpy as jnp


def test_evaluate_random_policy():
    res = evaluate(
        random_legal_policy(),
        num_games=64,
        key=jax.random.PRNGKey(0),
        batch_size=32,
    )
    s = res.summary()
    assert s["games"] == 64
    assert s["score_mean"] > 300  # random play always scores hundreds
    assert s["best_tile"] >= 64
    assert sum(s["max_tile_distribution"].values()) == 64
    assert (res.lengths > 20).all()


def test_demo_random_mode_runs_to_game_over():
    out = io.StringIO()
    stats = play(mode="random", delay=0.0, seed=1, out=out)
    text = out.getvalue()
    assert "GAME OVER" in text
    assert stats["score"] > 0
    assert stats["max_tile"] >= 16
    assert stats["moves"] > 20


def test_demo_manual_mode_scripted():
    out = io.StringIO()
    moves = iter(["a", "w", "d", "s", "x", "q"])  # x = ignored key
    stats = play(mode="manual", seed=2, out=out, input_fn=lambda: next(moves))
    assert stats["moves"] >= 3  # some of a/w/d/s applied


def test_render_board_shows_values():
    board = values_to_exponents(
        jnp.asarray([[2, 0, 0, 0], [0, 64, 0, 0], [0, 0, 1024, 0], [0, 0, 0, 0]])
    )
    text = render_board(board, score=123, moves=7, last_action=2)
    assert "1024" in text and "64" in text and "123" in text and "Right" in text


def test_cli_tabular_smoke(tmp_path, capsys):
    log = tmp_path / "tab.jsonl"
    rc = cli_main(
        [
            "train",
            "tabular",
            "--episodes", "64",
            "--batch", "32",
            "--capacity-log2", "14",
            "--steps-per-chunk", "32",
            "--log", str(log),
        ]
    )
    assert rc == 0
    rows = [json.loads(x) for x in log.read_text().splitlines()]
    assert rows and rows[-1]["episodes"] >= 64


def test_cli_dqn_train_eval_plot(tmp_path):
    log = tmp_path / "dqn.jsonl"
    ckpt = tmp_path / "ckpt"
    common = [
        "--features", "8", "--hidden", "16", "--blocks", "1", "--no-bf16",
        "--envs", "16", "--batch", "16", "--updates-per-step", "1",
        "--memory-size", "1024", "--steps-per-chunk", "8",
    ]
    rc = cli_main(
        ["train", "dqn", "--episodes", "15", "--log", str(log),
         "--checkpoint-dir", str(ckpt)] + common
    )
    assert rc == 0
    assert log.exists()

    # Eval the trained model from its checkpoint.
    import contextlib, io as _io

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(
            ["eval", "--policy", "model", "--checkpoint-dir", str(ckpt),
             "--games", "8", "--eval-batch", "8"] + common
        )
    assert rc == 0
    summary = json.loads(buf.getvalue())
    assert summary["games"] == 8

    # Plot from the JSONL log.
    out_png = tmp_path / "plot.png"
    rc = cli_main(["plot", "--log", str(log), "--out", str(out_png)])
    assert rc == 0
    assert out_png.exists() and out_png.stat().st_size > 1000

    # Warm-start a NEW run from that checkpoint (the reference's
    # resumed-lineage protocol, mainDQL:124-139): episode counters start
    # at 0 with the carried network/replay.
    log2 = tmp_path / "warm.jsonl"
    rc = cli_main(
        ["train", "dqn", "--episodes", "5", "--log", str(log2),
         "--warm-start", str(ckpt), "--seed", "3"] + common
    )
    assert rc == 0
    rows = [json.loads(l) for l in log2.read_text().splitlines()]
    # Fresh counters: the first row's env_steps is one chunk's worth,
    # not a continuation of the source run's.
    assert rows[0]["env_steps"] == 16 * 8
    # Carried lineage: the replay buffer starts pre-filled from the
    # source run rather than from the trickle of a cold start.
    assert rows[0]["buffer_size"] > 16 * 8


def test_cli_plot_every_regenerates_during_training(tmp_path):
    # The reference re-renders its 3-panel PNG every 10 episodes while
    # training (mainDQL:270-271); --plot-every is that behavior.
    log = tmp_path / "tab.jsonl"
    rc = cli_main(
        ["train", "tabular", "--episodes", "64", "--batch", "32",
         "--capacity-log2", "14", "--steps-per-chunk", "32",
         "--log", str(log), "--plot-every", "1"]
    )
    assert rc == 0
    png = tmp_path / "tab.png"
    assert png.exists() and png.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"


def test_cli_eval_model_requires_checkpoint(capsys):
    rc = cli_main(["eval", "--policy", "model", "--games", "4"])
    assert rc == 2


def test_cli_rejects_abbreviated_flags(capsys):
    """Prefix abbreviations are disabled: config.json overlay precedence
    (_user_specified) scans argv for the literal flag, so an abbreviated
    spelling like --eng would silently lose to the saved config. Better
    to reject it outright."""
    import pytest

    with pytest.raises(SystemExit) as exc:
        cli_main(["eval", "--policy", "random", "--games", "4",
                  "--eng", "lax"])
    assert exc.value.code == 2


def test_eval_uses_saved_run_config(tmp_path):
    """Training writes config.json; eval rebuilds the model from it even
    when the eval command omits the model flags."""
    ckpt = tmp_path / "cfg_ckpt"
    rc = cli_main(
        ["train", "dqn", "--episodes", "6",
         "--features", "8", "--hidden", "16", "--blocks", "1", "--no-bf16",
         "--envs", "8", "--batch", "16", "--updates-per-step", "1",
         "--memory-size", "512", "--steps-per-chunk", "8",
         "--checkpoint-dir", str(ckpt)]
    )
    assert rc == 0
    assert (ckpt / "config.json").exists()

    import contextlib, io as _io

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        # No model flags here — they come from config.json.
        rc = cli_main(
            ["eval", "--policy", "model", "--checkpoint-dir", str(ckpt),
             "--games", "4", "--eval-batch", "4"]
        )
    assert rc == 0
    summary = json.loads(buf.getvalue())
    assert summary["games"] == 4

    # Explicit CLI flags WIN over the saved config: forcing --engine lax
    # on eval must not be clobbered by config.json's engine (an A/B or
    # parity-debug eval has to be able to pin the engine).
    from tpu2048.cli.main import _load_run_config, build_parser

    argv = ["eval", "--policy", "model", "--checkpoint-dir", str(ckpt),
            "--games", "4", "--engine", "lax"]
    args = build_parser().parse_args(argv)
    args._argv = argv
    args = _load_run_config(args, str(ckpt))
    assert args.engine == "lax"
    assert args.features == 8  # non-overridden keys still load


def test_game_session_manual_and_reset():
    from tpu2048.eval.demo import GameSession

    s = GameSession(mode="manual", seed=3)
    assert s.alive and s.moves == 0 and s.last_action is None
    before = s.board_values().sum()
    for a in (0, 1, 2, 3):
        s.step_manual(a)
    assert s.moves == 4 and s.last_action == 3
    assert s.board_values().sum() >= before  # merges preserve tile sum; spawns add
    stats = s.stats()
    assert stats["moves"] == 4 and stats["max_tile"] >= 4
    s.reset()
    assert s.moves == 0 and s.last_action is None and s.alive


def test_game_session_auto_runs():
    from tpu2048.eval.demo import GameSession

    s = GameSession(mode="random", seed=4)
    actions = set()
    while s.alive and s.moves < 300:
        actions.add(s.step_auto())
    assert len(actions) >= 3  # random-legal policy uses many directions
    assert s.score > 0


def test_gui_tile_style_and_headless_import():
    # gui.py must be importable without a display (tkinter only inside
    # run_gui); tile_style maps the official palette.
    from tpu2048.eval.gui import TILE_HEX, tile_style

    assert tile_style(2) == (TILE_HEX[2], "#776e65")
    assert tile_style(2048)[0] == TILE_HEX[2048]
    assert tile_style(4096)[0] == "#3c3a32"  # super-tile style
    assert tile_style(0)[0] == TILE_HEX[0]


def test_cli_has_gui_subcommand():
    from tpu2048.cli.main import build_parser

    parser = build_parser()
    args = parser.parse_args(["gui", "--mode", "random", "--delay", "0.1"])
    assert args.mode == "random" and args.fn.__name__ == "cmd_gui"


def test_demo_model_mode_requires_source(capsys):
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="--mode model requires"):
        cli_main(["demo", "--mode", "model", "--delay", "0"])


def test_demo_table_policy_plays(tmp_path):
    """demo --table: a trained tabular Q-table drives model mode."""
    table_path = tmp_path / "q.npz"
    rc = cli_main(
        ["train", "tabular", "--episodes", "32", "--batch", "16",
         "--capacity-log2", "12", "--steps-per-chunk", "16",
         "--save", str(table_path)]
    )
    assert rc == 0

    from tpu2048.cli.main import _tabular_policy
    from tpu2048.eval.demo import GameSession

    session = GameSession(mode="model", policy=_tabular_policy(str(table_path)))
    for _ in range(12):
        session.step_auto()
    assert session.moves > 0 and session.score >= 0


def test_cli_warm_start_missing_source_exits_permanent(tmp_path):
    """A missing --warm-start source is a permanent configuration error:
    the CLI must return 2 (the code train_supervised.sh never retries),
    not 1 — a supervisor crash-looping 20 restarts against a deleted
    checkpoint directory burns the chip budget for nothing (observed r5)."""
    rc = cli_main(
        ["train", "dqn", "--episodes", "2",
         "--warm-start", str(tmp_path / "nonexistent_ckpt"),
         "--features", "8", "--hidden", "16", "--blocks", "1", "--no-bf16",
         "--envs", "8", "--batch", "8", "--updates-per-step", "1",
         "--memory-size", "256", "--steps-per-chunk", "4"]
    )
    assert rc == 2
