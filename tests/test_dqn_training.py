"""DQN training-loop integration test (tiny network, CPU)."""

import jax
import numpy as np

from tpu2048.agents.dqn import DQNConfig
from tpu2048.env import EnvConfig, SIMPLE
from tpu2048.training.dqn import DQNTrainConfig, train


def test_dqn_training_loop_end_to_end():
    config = DQNTrainConfig(
        agent=DQNConfig(
            features=8,
            hidden=16,
            num_blocks=1,
            bf16=False,
            dropout=0.0,
            memory_size=2048,
            batch_size=32,
            epsilon=0.9,
        ),
        env=EnvConfig(reward=SIMPLE, terminal_bonus=True),
        num_envs=32,
        updates_per_step=2,
        train_batch=32,
        steps_per_chunk=16,
        target_sync_episodes=8,
        prune_episodes=16,
        prune_n=2,
        checkpoint_episodes=20,
        seed=0,
    )
    ckpts, milestones = [], []
    logs = train(
        config,
        total_episodes=60,
        checkpoint_fn=lambda s, ep: ckpts.append(ep),
        milestone_fn=lambda s, ep, tile: milestones.append((ep, tile)),
    )
    assert logs, "no log rows produced"
    last = logs[-1]
    assert last["episodes"] >= 60
    assert last["buffer_size"] > 32
    assert last["train_steps"] > 0
    assert np.isfinite(last["loss"])
    assert last["best_tile"] >= 16
    assert sum(last["tile_hist"]) == last["episodes"]
    assert ckpts, "checkpoint cadence never fired"
    # Epsilon decayed from 0.9.
    assert last["epsilon"] < 0.9


def test_per_alpha_training_path_skews_sampling():
    """PER exercised through the training path (Dqn8:67-104).

    With ``alpha=0.6`` the full loop — sample -> TD -> priority write ->
    resample — must leave non-uniform priorities in the (sharded) buffer,
    and subsequent sampling must be measurably skewed toward
    high-priority transitions (priority^alpha-proportional, Dqn8:78-84),
    unlike the alpha=0 "NOPER" run of record.
    """
    import jax.numpy as jnp

    from tpu2048.replay import sharded as replaylib
    from tpu2048.training.dqn import init_loop_state, train_chunk
    from tpu2048.agents import dqn as dqnlib

    config = DQNTrainConfig(
        agent=DQNConfig(
            features=8, hidden=16, num_blocks=1, bf16=False, dropout=0.0,
            memory_size=1024, batch_size=32, epsilon=0.9, alpha=0.6,
        ),
        env=EnvConfig(reward=SIMPLE, terminal_bonus=True),
        num_envs=32,
        updates_per_step=2,
        train_batch=32,
        steps_per_chunk=16,
        replay_shards=2,  # exercise the sharded path
        seed=3,
    )
    model, state = init_loop_state(config)
    tx = dqnlib.make_optimizer(config.agent)
    chunk = jax.jit(lambda s: train_chunk(config, model, tx, s))
    for _ in range(4):
        state, _, _ = chunk(state)
    buf = state.buffer
    assert int(state.agent.train_steps) > 0, "learner never ran"

    # 1. Priority writes happened: the valid slots are non-uniform.
    size = np.asarray(buf.size)  # (S,)
    pri = np.asarray(buf.priorities)  # (S, C/S)
    valid = np.concatenate([pri[s, : size[s]] for s in range(2)])
    assert len(np.unique(np.round(valid, 6))) > 8, (
        "priorities still uniform after PER training — TD writes missing"
    )

    # 2. Sampling is skewed toward high priority, per shard.
    counts = np.zeros_like(pri)
    key = jax.random.PRNGKey(0)
    draws = 400
    for i in range(draws):
        key, k = jax.random.split(key)
        _, idx, _ = replaylib.sharded_sample(
            buf, k, config.train_batch, config.agent.alpha, config.agent.beta
        )
        idx = np.asarray(idx)  # (S, batch/S)
        for s in range(2):
            np.add.at(counts[s], idx[s], 1)
    for s in range(2):
        p = pri[s, : size[s]] ** 0.6
        c = counts[s, : size[s]]
        hi = p >= np.quantile(p, 0.75)
        lo = p <= np.quantile(p, 0.25)
        # Expected ratio is mean(p[hi])/mean(p[lo]); demand at least a
        # 1.5x empirical skew (uniform sampling would give ~1.0).
        assert c[hi].mean() > 1.5 * max(c[lo].mean(), 1e-9), (
            f"shard {s}: high-priority slots not preferentially sampled "
            f"({c[hi].mean():.2f} vs {c[lo].mean():.2f})"
        )

    # 3. The alpha=0 control: same buffer, uniform sampling, no skew.
    counts0 = np.zeros_like(pri)
    key = jax.random.PRNGKey(1)
    for i in range(draws):
        key, k = jax.random.split(key)
        _, idx, _ = replaylib.sharded_sample(buf, k, config.train_batch, 0.0, 1.0)
        idx = np.asarray(idx)
        for s in range(2):
            np.add.at(counts0[s], idx[s], 1)
    for s in range(2):
        p = pri[s, : size[s]] ** 0.6
        c = counts0[s, : size[s]]
        hi = p >= np.quantile(p, 0.75)
        lo = p <= np.quantile(p, 0.25)
        ratio = c[hi].mean() / max(c[lo].mean(), 1e-9)
        assert 0.7 < ratio < 1.4, f"alpha=0 sampling skewed ({ratio:.2f})"


def test_milestone_fires_at_512_tier():
    """The reference saves tiered models at 512/1024/2048
    (mainDQL:254-262); the 512 tier must fire, not just >=1024. Plant a
    512 tile (exponent 9) on one env so best_tile crosses the tier in
    the first chunk."""
    from tpu2048.training.dqn import init_loop_state

    config = DQNTrainConfig(
        agent=DQNConfig(
            features=8, hidden=16, num_blocks=1, bf16=False,
            dropout=0.0, memory_size=1024, batch_size=16, epsilon=0.9,
        ),
        env=EnvConfig(reward=SIMPLE, terminal_bonus=True),
        num_envs=8,
        updates_per_step=1,
        train_batch=16,
        steps_per_chunk=8,
        seed=0,
    )
    model, state = init_loop_state(config)
    env_state = state.env_state.replace(
        boards=state.env_state.boards.at[0, 0].set(9)
    )
    state = state.replace(env_state=env_state)
    milestones = []
    train(
        config, total_episodes=4, state=state, model=model,
        milestone_fn=lambda s, ep, tile: milestones.append((ep, tile)),
    )
    assert milestones, "512-tier milestone never fired"
    assert milestones[0][1] >= 512


def test_trace_env0_reference_csv(tmp_path):
    """Per-step env-0 trace mirrors the reference's debug CSV columns."""


    rows = []
    config = DQNTrainConfig(
        agent=DQNConfig(
            features=8, hidden=16, num_blocks=1, bf16=False, dropout=0.0,
            memory_size=512, epsilon=0.5,
        ),
        env=EnvConfig(reward=SIMPLE, terminal_bonus=True),
        num_envs=8,
        updates_per_step=1,
        train_batch=16,
        steps_per_chunk=8,
        trace_env0=True,
        seed=1,
    )
    train(config, total_episodes=8, trace_fn=rows.append)
    assert rows, "no trace rows"
    ep, action, legal, reward, total, state, done, saved, steps = rows[0]
    assert action in (0, 1, 2, 3)
    assert isinstance(legal, list) and all(a in range(4) for a in legal)
    assert len(state) == 16
    assert isinstance(done, bool) and isinstance(saved, bool)
    assert steps >= 1
    # Episode counter advances when env 0 finishes.
    eps_seen = [r[0] for r in rows]
    assert eps_seen == sorted(eps_seen)
    # Total reward accumulates within an episode.
    first_ep = [r for r in rows if r[0] == eps_seen[0]]
    if len(first_ep) > 2:
        assert first_ep[1][4] != first_ep[0][4] or first_ep[1][3] == 0.0
