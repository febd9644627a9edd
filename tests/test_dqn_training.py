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
