"""Statistical parity: random-play outcome distributions vs the reference.

Beyond exact seeded trajectory parity (tests/test_env.py), BASELINE.json
config 5 asks for a reference-matched eval score distribution. Here the
ACTUAL reference env (imported read-only) plays random games and its
score / final-tile / episode-length distributions are compared against our
batched env's under the same policy.
"""

import sys

import jax
import numpy as np
import pytest

from tpu2048.env import EnvConfig, SIMPLE
from tpu2048.eval import evaluate, random_legal_policy

REF_DIR = "/root/reference/Deep_QLearning/environment"


def _reference_random_games(n_games: int, seed: int):
    if REF_DIR not in sys.path:
        sys.path.insert(0, REF_DIR)
    try:
        from Game2048_nopenalty_env import Game2048_env  # noqa: PLC0415
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference env unavailable: {exc}")
    np.random.seed(seed)
    rng = np.random.RandomState(seed + 1)
    scores, tiles, lengths = [], [], []
    for _ in range(n_games):
        env = Game2048_env()
        done = False
        steps = 0
        while not done and steps < 4000:
            # Random-legal action (the reference GameDemo random mode keeps
            # pressing until something moves; uniform-legal is equivalent
            # in distribution of resulting states).
            legal = []
            for a in range(4):
                moved, _ = env.game.move(a, trial=True)
                if moved:
                    legal.append(a)
            if not legal:
                break
            action = legal[rng.randint(len(legal))]
            obs, reward, done, maxn = env.step(action)
            env.game.board = np.asarray(obs).copy()  # driver commit
            steps += 1
        scores.append(env.score)
        tiles.append(int(np.max(env.game.board)))
        lengths.append(steps)
    return np.asarray(scores), np.asarray(tiles), np.asarray(lengths)


def test_random_play_distribution_matches_reference():
    ref_scores, ref_tiles, ref_lengths = _reference_random_games(48, seed=0)

    res = evaluate(
        random_legal_policy(),
        num_games=1024,
        key=jax.random.PRNGKey(0),
        env_config=EnvConfig(reward=SIMPLE, auto_reset=False),
        batch_size=512,
    )

    # Means within ~3 standard errors of the (noisier) reference sample.
    se_score = ref_scores.std() / np.sqrt(len(ref_scores))
    assert abs(res.scores.mean() - ref_scores.mean()) < 4 * se_score, (
        res.scores.mean(), ref_scores.mean(), se_score
    )
    se_len = ref_lengths.std() / np.sqrt(len(ref_lengths))
    assert abs(res.lengths.mean() - ref_lengths.mean()) < 4 * se_len + 2

    # Final-tile distribution: the mode must agree (64 or 128 for random
    # play) and the coarse mass distribution must overlap.
    ours = res.tile_distribution
    ref_vals, ref_counts = np.unique(ref_tiles, return_counts=True)
    ref_mode = int(ref_vals[np.argmax(ref_counts)])
    our_mode = max(ours, key=ours.get)
    assert {ref_mode, our_mode} <= {64, 128}
    # Mass in {64, 128} dominates both.
    ref_mass = sum(
        c for v, c in zip(ref_vals, ref_counts) if v in (64, 128)
    ) / len(ref_tiles)
    our_mass = (ours.get(64, 0) + ours.get(128, 0)) / sum(ours.values())
    assert ref_mass > 0.6 and our_mass > 0.6
    assert abs(ref_mass - our_mass) < 0.25
