"""Replay buffer tests: insertion, ring wrap, sampling, PER, pruning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu2048.replay import (
    prune_low_score_episodes,
    replay_add,
    replay_init,
    replay_peek,
    replay_sample,
    replay_update_priorities,
)


def tr(n, start=0, done_at=()):
    """Build n dummy transitions with board[0,0] = id for tracing."""
    ids = np.arange(start, start + n)
    boards = np.zeros((n, 4, 4), np.int8)
    boards[:, 0, 0] = ids % 16
    next_boards = np.zeros((n, 4, 4), np.int8)
    next_boards[:, 0, 1] = ids % 16
    actions = ids % 4
    rewards = ids.astype(np.float32)
    dones = np.isin(ids, list(done_at))
    return (
        jnp.asarray(boards),
        jnp.asarray(actions),
        jnp.asarray(rewards),
        jnp.asarray(dones),
        jnp.asarray(next_boards),
    )


def test_add_and_peek():
    buf = replay_init(16)
    b, a, r, d, nb = tr(5)
    buf = replay_add(buf, b, a, r, d, nb, jnp.ones(5, bool))
    assert int(buf.size) == 5 and int(buf.ptr) == 5
    last = replay_peek(buf, 0)
    assert float(last["reward"]) == 4.0
    third = replay_peek(buf, 1)  # reference's get_third_last = 2-back entry
    assert float(third["reward"]) == 3.0
    # New entries carry max_priority = 1.0.
    np.testing.assert_allclose(np.asarray(buf.priorities[:5]), np.ones(5))


def test_add_mask_compacts():
    buf = replay_init(16)
    b, a, r, d, nb = tr(6)
    mask = jnp.asarray([True, False, True, False, True, True])
    buf = replay_add(buf, b, a, r, d, nb, mask)
    assert int(buf.size) == 4
    np.testing.assert_allclose(np.asarray(buf.rewards[:4]), [0, 2, 4, 5])


def test_ring_wrap():
    buf = replay_init(8)
    b, a, r, d, nb = tr(6)
    buf = replay_add(buf, b, a, r, d, nb, jnp.ones(6, bool))
    b, a, r, d, nb = tr(6, start=6)
    buf = replay_add(buf, b, a, r, d, nb, jnp.ones(6, bool))
    assert int(buf.size) == 8
    assert int(buf.ptr) == 4
    # Slots now hold entries 4..11 in ring order [8,9,10,11,4,5,6,7].
    np.testing.assert_allclose(
        np.asarray(buf.rewards), [8, 9, 10, 11, 4, 5, 6, 7]
    )


def test_sample_uniform_covers_valid_range():
    buf = replay_init(64)
    b, a, r, d, nb = tr(10)
    buf = replay_add(buf, b, a, r, d, nb, jnp.ones(10, bool))
    batch, idx, w = replay_sample(buf, jax.random.PRNGKey(0), 256, 0.0, 1.0)
    assert (np.asarray(idx) < 10).all()
    # Uniform: all 10 slots hit; IS weights all 1 (uniform, beta arbitrary).
    assert len(np.unique(np.asarray(idx))) == 10
    np.testing.assert_allclose(np.asarray(w), np.ones(256), rtol=1e-5)
    assert batch["board"].shape == (256, 4, 4)
    np.testing.assert_array_equal(
        np.asarray(batch["reward"]), np.asarray(buf.rewards)[np.asarray(idx)]
    )


def test_sample_prioritized_prefers_high_priority():
    buf = replay_init(64)
    b, a, r, d, nb = tr(10)
    buf = replay_add(buf, b, a, r, d, nb, jnp.ones(10, bool))
    # Slot 3 gets a huge TD error.
    buf = replay_update_priorities(
        buf, jnp.asarray([3]), jnp.asarray([100.0])
    )
    assert float(buf.max_priority) == pytest.approx(100.0 + 1e-6)
    _, idx, w = replay_sample(buf, jax.random.PRNGKey(1), 512, 1.0, 1.0)
    counts = np.bincount(np.asarray(idx), minlength=10)
    assert counts[3] > 0.8 * 512
    # IS weights: rare samples upweighted relative to the frequent one.
    assert np.asarray(w).max() == pytest.approx(1.0)


def test_update_priorities_roundtrip():
    buf = replay_init(32)
    b, a, r, d, nb = tr(4)
    buf = replay_add(buf, b, a, r, d, nb, jnp.ones(4, bool))
    buf = replay_update_priorities(
        buf, jnp.asarray([0, 2]), jnp.asarray([-0.5, 2.0])
    )
    np.testing.assert_allclose(
        np.asarray(buf.priorities[:4]),
        [0.5 + 1e-6, 1.0, 2.0 + 1e-6, 1.0],
        rtol=1e-5,
    )


def test_prune_low_score_episodes():
    buf = replay_init(32)
    # Three complete episodes (ends at ids 2, 5, 9) + trailing partial
    # (ids 10, 11). Episode scores (sum of positive rewards):
    # ep0: 0+1+2=3, ep1: 3+4+5=12, ep2: 6+7+8+9=30.
    b, a, r, d, nb = tr(12, done_at=(2, 5, 9))
    buf = replay_add(buf, b, a, r, d, nb, jnp.ones(12, bool))
    pruned = jax.jit(prune_low_score_episodes, static_argnums=1)(buf, 2)
    # Worst two episodes (0 and 1) dropped; ep2 + trailing partial kept.
    assert int(pruned.size) == 6
    np.testing.assert_allclose(
        np.asarray(pruned.rewards[:6]), [6, 7, 8, 9, 10, 11]
    )
    np.testing.assert_array_equal(
        np.asarray(pruned.dones[:6]), [False, False, False, True, False, False]
    )
    # Priorities traveled with their entries (reference bug fixed).
    np.testing.assert_allclose(np.asarray(pruned.priorities[:6]), np.ones(6))
    assert float(pruned.max_priority) == 1.0


def test_prune_more_than_available_keeps_partial():
    buf = replay_init(16)
    b, a, r, d, nb = tr(5, done_at=(2,))  # one complete ep + partial
    buf = replay_add(buf, b, a, r, d, nb, jnp.ones(5, bool))
    pruned = prune_low_score_episodes(buf, 10)
    assert int(pruned.size) == 2  # only the trailing partial survives
    np.testing.assert_allclose(np.asarray(pruned.rewards[:2]), [3, 4])


def test_prune_after_wrap():
    buf = replay_init(8)
    b, a, r, d, nb = tr(10, done_at=(3, 7))
    buf = replay_add(buf, b, a, r, d, nb, jnp.ones(10, bool))
    # Ring holds ids 2..9; complete eps in-window: [2,3] (score 5) and
    # [4..7] (score 22); trailing partial [8,9].
    pruned = prune_low_score_episodes(buf, 1)
    np.testing.assert_allclose(
        np.asarray(pruned.rewards[: int(pruned.size)]), [4, 5, 6, 7, 8, 9]
    )
