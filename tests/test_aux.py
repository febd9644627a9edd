"""Aux-subsystem tests: profiling harness, checkify guard, metric loggers.

The reference has none of these (SURVEY.md §5); these cover the new
framework's tracing/sanitizer/observability tier.
"""

import csv
import json
import math

import jax
import jax.numpy as jnp
import pytest

from tpu2048.metrics.profiling import annotate, time_fn, trace
from tpu2048.utils.debug import checked


def test_time_fn_measures_jitted_call():
    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((64, 64))
    sec = time_fn(f, x, iters=3, warmup=1)
    assert 0 < sec < 5.0


def test_time_fn_handles_pytree_and_scalar_outputs():
    f = jax.jit(lambda x: {"a": x * 2, "b": (x.sum(), x + 1)})
    sec = time_fn(f, jnp.arange(8.0), iters=2)
    assert sec > 0


def test_trace_writes_profile_dir(tmp_path):
    logdir = tmp_path / "trace"
    with trace(str(logdir)):
        with annotate("span"):
            jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    assert logdir.exists() and any(logdir.rglob("*"))


def test_checked_passes_clean_fn():
    f = checked(jax.jit(lambda x: x * 2.0))
    assert float(f(jnp.float32(3.0))) == 6.0


def test_checked_raises_on_nan():
    f = checked(jax.jit(lambda x: jnp.log(x)))
    with pytest.raises(Exception) as e:
        f(jnp.float32(-1.0))
    assert "nan" in str(e.value).lower()
    assert math.isnan(float(jnp.log(jnp.float32(-1.0))))  # unguarded = silent


def test_plot_training_renders_png(tmp_path):
    from tpu2048.metrics.logging import plot_from_jsonl

    jpath = tmp_path / "m.jsonl"
    rows = [
        {"episodes": i, "best_tile": 2 ** (4 + i % 3), "mean_score": 100.0 * i,
         "loss": 10.0 / (i + 1)}
        for i in range(20)
    ]
    jpath.write_text("".join(json.dumps(r) + "\n" for r in rows))
    out = tmp_path / "plots" / "train.png"
    plot_from_jsonl(str(jpath), str(out))
    assert out.exists() and out.stat().st_size > 1000
    assert out.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"


def test_jsonl_and_csv_loggers_roundtrip(tmp_path):
    from tpu2048.metrics import CSVLogger, JSONLLogger

    jpath = tmp_path / "m.jsonl"
    jl = JSONLLogger(str(jpath))
    jl.log({"episodes": 1, "score": 2.5})
    jl.log({"episodes": 2, "score": 3.5})
    jl.close()
    rows = [json.loads(line) for line in jpath.read_text().splitlines()]
    assert rows[1]["score"] == 3.5

    cpath = tmp_path / "t.csv"
    cl = CSVLogger(str(cpath), ["a", "b"])
    cl.log([1, "x"])
    cl.close()
    with open(cpath) as fh:
        got = list(csv.reader(fh))
    assert got[0] == ["a", "b"] and got[1] == ["1", "x"]


def test_analyze_milestones_and_wins(tmp_path):
    """`analyze` recovers the reference-comparable numbers (first-tile
    episodes, wins from the final-tile histogram) from a metrics log."""
    import json

    from tpu2048.metrics.analyze import analyze

    rows = [
        {"episodes": 10, "env_steps": 1000, "best_tile": 256,
         "tile_hist": [0] * 17, "mean_score": 100.0, "train_steps": 10},
        {"episodes": 30, "env_steps": 3000, "best_tile": 1024,
         "tile_hist": [0] * 17, "mean_score": 500.0, "train_steps": 30},
        {"episodes": 90, "env_steps": 9000, "best_tile": 2048,
         "tile_hist": [0, 0, 0, 0, 0, 0, 0, 1, 2, 40, 44, 3, 0, 0, 0, 0, 0],
         "mean_score": 900.0, "train_steps": 90,
         "action_counts": [70, 10, 10, 10]},
    ]
    path = tmp_path / "m.jsonl"
    path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    out = analyze(str(path))
    assert out["episodes"] == 90
    assert out["first_256_by_episode"] == 10
    assert out["first_512_by_episode"] == 30
    assert out["first_1024_by_episode"] == 30
    assert out["first_2048_by_episode"] == 90
    # Regime-comparable axes (episodes compress exploration under B
    # parallel envs): transitions and gradient updates at the milestone.
    assert out["first_1024_by_env_steps"] == 3000
    assert out["first_1024_by_train_steps"] == 30
    assert out["first_2048_by_env_steps"] == 9000
    assert out["games_won_2048"] == 3
    assert out["final_tile_distribution"]["2048"] == 3
    assert out["action_fractions"]["L"] == 0.7


def test_analyze_rollback_stats(tmp_path):
    """Rollback restores rewind the per-row episode counter; analyze
    reports the restore count and total episodes replayed."""
    import json

    from tpu2048.metrics.analyze import analyze

    rows = [
        {"episodes": 20, "best_tile": 128, "rollbacks": 0},
        {"episodes": 40, "best_tile": 128, "rollbacks": 0},
        {"episodes": 25, "best_tile": 128, "rollbacks": 1},  # rewound 15
        {"episodes": 45, "best_tile": 256, "rollbacks": 1},
        {"episodes": 41, "best_tile": 256, "rollbacks": 2},  # rewound 4
        {"episodes": 60, "best_tile": 256, "rollbacks": 2},
    ]
    path = tmp_path / "m.jsonl"
    path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    out = analyze(str(path))
    assert out["rollbacks"] == 2
    assert out["episodes_replayed"] == 19


# ---------------------------------------------------------------------------
# Watchdog (failure detection, SURVEY §5): a wedged device call raises
# nothing and blocks forever; the watchdog converts no-progress into a
# restartable exit so checkpoint/resume supervision can take over.


def test_watchdog_fires_on_stall():
    import threading

    from tpu2048.utils.watchdog import Watchdog

    fired = threading.Event()
    stales = []
    wd = Watchdog(timeout=0.2, label="t",
                  on_timeout=lambda s: (stales.append(s), fired.set()),
                  poll_interval=0.05)
    wd.start()
    assert fired.wait(timeout=5.0), "watchdog never fired on a stall"
    wd.stop()
    assert stales and stales[0] > 0.2


def test_watchdog_quiet_under_heartbeats():
    import time as _time

    from tpu2048.utils.watchdog import Watchdog

    # Generous margins (timeout >> sleep) so scheduler jitter on a loaded
    # CI box can't legitimately fire the watchdog.
    fired = []
    wd = Watchdog(timeout=2.0, label="t", on_timeout=fired.append,
                  poll_interval=0.05)
    wd.start()
    for _ in range(8):
        _time.sleep(0.25)
        wd.beat()
    wd.stop()
    assert not fired
    # And after stop() a stall no longer fires.
    _time.sleep(0.5)
    assert not fired


def test_watchdog_startup_floor_defers_first_fire():
    """A --watchdog value sized for steady-state chunks must not kill the
    first (compiling) chunk: before the first beat the effective window is
    max(timeout, startup_floor); after it, plain timeout (VERDICT r4 #7)."""
    import threading
    import time as _time

    from tpu2048.utils.watchdog import Watchdog

    fired = threading.Event()
    wd = Watchdog(timeout=0.2, label="t",
                  on_timeout=lambda s: fired.set(),
                  poll_interval=0.05, startup_floor=30.0)
    wd.start()
    # Well past the steady-state timeout, still inside the startup floor,
    # no beat yet (a slow fake first chunk): must NOT fire.
    _time.sleep(0.8)
    assert not fired.is_set(), "fired during the startup grace window"
    # First beat ends the grace; a stall now fires at the plain timeout.
    wd.beat()
    assert fired.wait(timeout=5.0), "never fired after the first beat"
    wd.stop()


def test_watchdog_rejects_nonpositive_timeout():
    from tpu2048.utils.watchdog import Watchdog

    with pytest.raises(ValueError):
        Watchdog(timeout=0)


def test_dqn_train_completes_with_watchdog_enabled():
    """watchdog_timeout plumbs through DQNTrainConfig and a healthy run
    neither fires it nor leaks the thread."""
    import threading

    from tpu2048.agents.dqn import DQNConfig
    from tpu2048.env import EnvConfig, SIMPLE
    from tpu2048.training.dqn import DQNTrainConfig, train

    config = DQNTrainConfig(
        agent=DQNConfig(features=8, hidden=16, num_blocks=1, bf16=False,
                        dropout=0.0, memory_size=512, epsilon=0.5),
        env=EnvConfig(reward=SIMPLE, terminal_bonus=True),
        num_envs=8,
        updates_per_step=1,
        train_batch=8,
        steps_per_chunk=8,
        watchdog_timeout=600.0,
        seed=3,
    )
    logs = train(config, total_episodes=4)
    assert logs[-1]["episodes"] >= 4
    assert not any(
        t.name.startswith("watchdog:") for t in threading.enumerate()
    )
