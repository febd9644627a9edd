"""Tabular agent tests: Q-table semantics, update math, epsilon schedule,
and a short end-to-end learning run (SURVEY.md §4 item 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu2048.agents import tabular as tab
from tpu2048.env import EnvConfig, SHAPED
from tpu2048.training.tabular import (
    TabularTrainConfig,
    init_train_state,
    train_chunk,
)


def boards_from(*vals):
    out = []
    for v in vals:
        out.append(jnp.asarray(v, jnp.int8))
    return jnp.stack(out)


B1 = [[1, 0, 0, 0], [0, 2, 0, 0], [0, 0, 3, 0], [0, 0, 0, 0]]
B2 = [[0, 1, 0, 0], [0, 2, 0, 0], [0, 0, 3, 0], [0, 0, 0, 0]]
B3 = [[5, 5, 0, 0], [0, 0, 0, 0], [1, 0, 0, 2], [0, 0, 0, 0]]


def test_pack_board_distinct():
    lo1, hi1 = tab.pack_board(jnp.asarray(B1, jnp.int8))
    lo2, hi2 = tab.pack_board(jnp.asarray(B2, jnp.int8))
    assert (int(lo1), int(hi1)) != (int(lo2), int(hi2))


def test_lookup_unseen_is_zero():
    table = tab.qtable_init(10)
    q = tab.qtable_lookup(table, boards_from(B1, B2))
    np.testing.assert_array_equal(np.asarray(q), np.zeros((2, 4)))


def test_update_then_lookup_roundtrip():
    table = tab.qtable_init(10)
    boards = boards_from(B1, B2)
    actions = jnp.asarray([2, 3])
    targets = jnp.asarray([1.0, -0.5])
    table = tab.qtable_update(table, boards, actions, targets, 0.1)
    q = np.asarray(tab.qtable_lookup(table, boards))
    # Q[s,a] += lr * (target - 0)
    assert q[0, 2] == pytest.approx(0.1)
    assert q[1, 3] == pytest.approx(-0.05)
    assert (q[0, [0, 1, 3]] == 0).all()
    assert int(table.dropped) == 0
    # Second update moves toward target from the stored value.
    table = tab.qtable_update(table, boards, actions, targets, 0.1)
    q2 = np.asarray(tab.qtable_lookup(table, boards))
    assert q2[0, 2] == pytest.approx(0.1 + 0.1 * (1.0 - 0.1))


def test_update_matches_reference_math():
    """Full Q-update chain vs hand-computed reference values
    (Agent/main.py:40-43)."""
    lr, gamma = 0.1, 0.9
    table = tab.qtable_init(10)
    s, s2 = boards_from(B1), boards_from(B3)
    # Seed Q[s2] with known values via direct updates.
    for a, tgt in [(0, 2.0), (1, 5.0), (2, 1.0), (3, 0.0)]:
        table = tab.qtable_update(
            table, s2, jnp.asarray([a]), jnp.asarray([tgt]), 1.0
        )
    np.testing.assert_allclose(
        np.asarray(tab.qtable_lookup(table, s2))[0], [2.0, 5.0, 1.0, 0.0]
    )
    # Non-terminal update: target = r + gamma * max Q[s'] = 1 + .9*5 = 5.5
    reward = jnp.asarray([1.0])
    targets = tab.q_learning_targets(
        table, reward, s2, jnp.asarray([False]), gamma
    )
    assert float(targets[0]) == pytest.approx(5.5)
    table = tab.qtable_update(table, s, jnp.asarray([1]), targets, lr)
    assert float(tab.qtable_lookup(table, s)[0, 1]) == pytest.approx(0.1 * 5.5)
    # Terminal update ignores Q[s'].
    targets_t = tab.q_learning_targets(
        table, reward, s2, jnp.asarray([True]), gamma
    )
    assert float(targets_t[0]) == pytest.approx(1.0)


def test_duplicate_states_in_batch_combine():
    table = tab.qtable_init(10)
    boards = boards_from(B1, B1, B1)
    actions = jnp.asarray([0, 0, 1])
    targets = jnp.asarray([1.0, 1.0, 2.0])
    table = tab.qtable_update(table, boards, actions, targets, 0.1)
    q = np.asarray(tab.qtable_lookup(table, boards_from(B1)))[0]
    # Both action-0 updates read Q=0 and add lr*1.0 each.
    assert q[0] == pytest.approx(0.2)
    assert q[1] == pytest.approx(0.2)


def test_saturated_table_drops_are_counted_and_consistent():
    """Overfilling a tiny table: lost inserts land in ``dropped``; every
    state that DID insert still reads back its exact Q value (no aliasing,
    no corruption). This is the failure mode the 200k-game run of record
    hit at PROBES=8/2^24 (45% of late-training inserts dropped)."""
    table = tab.qtable_init(5)  # 32 slots, far fewer than the inserts
    key = jax.random.PRNGKey(0)
    boards = jax.random.randint(key, (128, 4, 4), 0, 6, jnp.int32).astype(
        jnp.int8
    )
    actions = jnp.zeros((128,), jnp.int32)
    targets = jnp.arange(128, dtype=jnp.float32) + 1.0
    # lr=1.0: a successful fresh insert stores exactly its target.
    table = tab.qtable_update(table, boards, actions, targets, 1.0)
    dropped = int(table.dropped)
    occupied = int(jnp.sum(table.occupied))
    assert dropped > 0, "a 32-slot table must drop some of 128 inserts"
    # Dedup the random boards before accounting (duplicates combine).
    lo, hi = tab.pack_board(boards)
    distinct = len({(int(a), int(b)) for a, b in zip(lo, hi)})
    assert occupied + dropped >= distinct
    assert occupied <= 32
    # Every state the table claims to hold reads back uncorrupted: its
    # Q[a=0] equals the target of (one of) the inserts for that state.
    q = tab.qtable_lookup(table, boards)  # (128, 4)
    found = np.asarray(q[:, 0])
    for i in range(128):
        if found[i] != 0.0:
            assert found[i] in np.asarray(targets), found[i]


def test_choose_actions_greedy_and_explore():
    table = tab.qtable_init(10)
    s = boards_from(B1)
    table = tab.qtable_update(table, s, jnp.asarray([3]), jnp.asarray([10.0]), 1.0)
    # epsilon=0 -> always greedy -> action 3.
    acts = [
        int(
            tab.choose_actions(table, s, 0.0, jax.random.PRNGKey(i))[0]
        )
        for i in range(8)
    ]
    assert acts == [3] * 8
    # epsilon=1 -> uniform random: all 4 actions appear over many draws.
    acts = [
        int(tab.choose_actions(table, s, 1.0, jax.random.PRNGKey(i))[0])
        for i in range(64)
    ]
    assert set(acts) == {0, 1, 2, 3}


def _reference_epsilon_schedule(total_epochs, e0=1.0, emin=0.01):
    """Independent replication of the reference's iterative decay
    (Agent/main.py:23-32,45-57) for oracle comparison."""
    first = total_epochs * 0.30
    second = total_epochs * 0.60
    third = total_epochs * 0.80
    slow1 = (e0 - emin * 1.5) / first
    fast = ((e0 - emin) - emin * 1.5) / (second - first)
    slow2 = (emin * 1.1 - emin) / (third - second)
    eps = e0
    out = [eps]
    for epoch in range(total_epochs):
        if epoch < first:
            eps = max(emin * 1.5, eps - slow1)
        elif epoch < second:
            eps = max(emin * 1.1, eps - fast)
        elif epoch < third:
            eps = max(emin, eps - slow2)
        else:
            eps = emin
        out.append(eps)
    return out


@pytest.mark.parametrize("total", [10, 100, 333])
def test_epsilon_schedule_matches_reference(total):
    cfg = tab.TabularConfig(total_epochs=total)
    oracle = _reference_epsilon_schedule(total)
    ours = np.asarray(
        tab.epsilon_for_epoch(jnp.arange(total + 1, dtype=jnp.float32), cfg)
    )
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


@pytest.mark.parametrize("e0,emin,total", [
    (0.8, 0.05, 100),   # lower start, higher floor
    (1.0, 0.001, 250),  # much lower floor
    (0.5, 0.1, 77),     # narrow range, awkward boundaries
])
def test_epsilon_schedule_non_default_endpoints(e0, emin, total):
    """The closed form must track the iterative reference at ANY
    exploration_rate/exploration_min, not just the 1.0/0.01 defaults —
    the phase floors (1.5x/1.1x emin) and slopes all scale with the
    endpoints (Agent/main.py:23-32)."""
    cfg = tab.TabularConfig(
        total_epochs=total, exploration_rate=e0, exploration_min=emin
    )
    oracle = _reference_epsilon_schedule(total, e0=e0, emin=emin)
    ours = np.asarray(
        tab.epsilon_for_epoch(jnp.arange(total + 1, dtype=jnp.float32), cfg)
    )
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


def test_tabular_training_chunk_learns():
    """End-to-end: a few jitted chunks on the shaped env should populate the
    Q-table, finish episodes, and produce finite stats."""
    config = TabularTrainConfig(
        agent=tab.TabularConfig(total_epochs=100, capacity_log2=16),
        env=EnvConfig(reward=SHAPED),
        batch_size=64,
        steps_per_chunk=64,
        total_episodes=100,
    )
    chunk = jax.jit(lambda s: train_chunk(config, s))
    state = init_train_state(config)
    for _ in range(4):
        state, eps = chunk(state)
    assert int(state.env_steps) == 4 * 64 * 64
    assert int(jnp.sum(state.table.occupied)) > 100
    assert int(state.episodes_done) > 0
    assert int(state.best_tile) >= 16
    assert np.isfinite(float(state.sum_return))
    assert int(jnp.sum(state.action_counts)) == int(state.env_steps)
    # Q-values were actually written (auto on the CPU test platform =
    # the packed xla table; unpack to the canonical layout to inspect).
    from tpu2048.agents.tabular_fast import PackedQTable, unpack_qtable

    table = state.table
    if isinstance(table, PackedQTable):
        table = unpack_qtable(table)
    assert float(jnp.sum(jnp.abs(table.q))) > 0


def test_qtable_save_load_and_cli_tabular_eval(tmp_path):
    """Q-table persistence + `eval --policy tabular` (the reference had NO
    tabular persistence: the dict table died with the process)."""
    import contextlib
    import io
    import json

    from tpu2048.cli.main import main as cli_main

    table_path = tmp_path / "q.npz"
    rc = cli_main(
        ["train", "tabular", "--episodes", "64", "--batch", "32",
         "--capacity-log2", "14", "--steps-per-chunk", "32",
         "--save", str(table_path)]
    )
    assert rc == 0 and table_path.exists()

    from tpu2048.agents.tabular import load_qtable

    table = load_qtable(str(table_path))
    assert int(table.occupied.sum()) > 0

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(
            ["eval", "--policy", "tabular", "--table", str(table_path),
             "--games", "8", "--eval-batch", "8"]
        )
    assert rc == 0
    summary = json.loads(buf.getvalue())
    assert summary["games"] == 8 and summary["score_mean"] > 0


def test_rehash_preserves_lookups_from_foreign_placement():
    """rehash_table re-places entries saved under ANY other placement
    scheme (e.g. the r2/r3 linear-probe layout) so bucketed lookups
    return the exact same Q rows — the load path for old .npz files."""
    from tpu2048.agents.tabular import (
        QTable, pack_board, qtable_init, qtable_lookup, rehash_table,
    )

    rng = np.random.default_rng(7)
    boards = rng.integers(0, 12, size=(200, 4, 4)).astype(np.int8)
    # De-duplicate states (duplicate keys would legitimately fork rows).
    lo, hi = pack_board(jnp.asarray(boards))
    _, uniq = np.unique(
        np.asarray(lo).astype(np.uint64) << 32 | np.asarray(hi),
        return_index=True,
    )
    boards = boards[uniq]
    lo, hi = pack_board(jnp.asarray(boards))
    n = boards.shape[0]

    # Place each key at an arbitrary slot unrelated to its hash —
    # emulating a file written by a different probing scheme.
    table = qtable_init(12)
    slots = rng.choice(table.capacity, size=n, replace=False)
    q_rows = rng.normal(size=(n, 4)).astype(np.float32)
    table = QTable(
        key_lo=table.key_lo.at[slots].set(lo),
        key_hi=table.key_hi.at[slots].set(hi),
        q=table.q.at[slots].set(jnp.asarray(q_rows)),
        dropped=table.dropped,
    )
    fixed = rehash_table(table)
    assert int(fixed.occupied.sum()) + int(fixed.dropped) == n
    got = np.asarray(qtable_lookup(fixed, jnp.asarray(boards)))
    found = got.any(axis=1)
    # At load factor n/4096 << 1 nothing should drop...
    assert int(fixed.dropped) == 0
    # ...and every state must read back its exact row.
    np.testing.assert_array_equal(got, q_rows)
    assert found.all()
