"""Packed Q-table fast path (agents/tabular_fast.py, ops/table_kernel.py).

Differential strategy, mirroring the env kernel's (tests/test_pallas_step.py):
the pure-jnp "xla" backend is checked for semantic equality against the
LEGACY table ops (agents/tabular.py) on collision-free batches, the
documented collision semantics are pinned explicitly, and the real Pallas
kernels (interpret mode on CPU) are checked BIT-EXACT against the xla
backend — the two backends share all resolve logic, so the only difference
under test is the DMA path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu2048.agents import tabular as tab
from tpu2048.agents import tabular_fast as tabf
from tpu2048.ops import table_kernel as tk


def random_boards(key, n):
    return jax.random.randint(key, (n, 4, 4), 0, 12, dtype=jnp.int8)


def populated_pair(key, capacity_log2=16, n_seed=200):
    """A legacy table and its packed twin, populated with n_seed states."""
    table = tab.qtable_init(capacity_log2)
    boards = random_boards(key, n_seed)
    actions = jax.random.randint(jax.random.fold_in(key, 1), (n_seed,), 0, 4)
    targets = jax.random.normal(jax.random.fold_in(key, 2), (n_seed,))
    table = tab.qtable_update(table, boards, actions, targets, 0.5)
    return table, tabf.pack_qtable(table)


def test_pack_unpack_roundtrip():
    key = jax.random.PRNGKey(0)
    table, packed = populated_pair(key)
    back = tabf.unpack_qtable(packed)
    for a, b in zip(jax.tree.leaves(table), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert packed.capacity == table.capacity
    np.testing.assert_array_equal(
        np.asarray(packed.occupied), np.asarray(table.occupied)
    )


def test_fast_lookup_matches_legacy():
    key = jax.random.PRNGKey(1)
    table, packed = populated_pair(key)
    boards = jnp.concatenate(
        [random_boards(jax.random.fold_in(key, 3), 64),
         random_boards(key, 200)[:32]]  # 32 definitely-present states
    )
    np.testing.assert_array_equal(
        np.asarray(tabf.fast_lookup(packed, boards)),
        np.asarray(tab.qtable_lookup(table, boards)),
    )


def _collision_free(boards, capacity):
    """Filter to one board per bucket (drops intra-batch claim races)."""
    lo, hi = tab.pack_board(boards)
    bucket = np.asarray(tab._hash(lo, hi, capacity // tab.PROBES))
    _, first = np.unique(bucket, return_index=True)
    return boards[jnp.asarray(np.sort(first))]


def test_fast_step_matches_legacy_collision_free():
    """choose+targets+update on the xla backend == the legacy ops,
    bit-exact, when no two batch entries share a bucket."""
    key = jax.random.PRNGKey(2)
    table, packed = populated_pair(key)
    k1, k2, k3 = jax.random.split(jax.random.fold_in(key, 9), 3)
    boards = _collision_free(random_boards(k1, 96), table.capacity)
    nxt = _collision_free(random_boards(k2, 96), table.capacity)
    n = min(boards.shape[0], nxt.shape[0])
    boards, nxt = boards[:n], nxt[:n]
    rewards = jax.random.normal(k3, (n,))
    dones = jnp.arange(n) % 3 == 0

    a_l, probe_l = tab.choose_actions_probed(table, boards, 0.3, k3)
    a_f, probe_f = tabf.fast_choose_actions_probed(
        packed, boards, 0.3, k3, backend="xla"
    )
    np.testing.assert_array_equal(np.asarray(a_l), np.asarray(a_f))

    t_l = tab.q_learning_targets(table, rewards, nxt, dones, 0.9)
    t_f = tabf.fast_targets(packed, rewards, nxt, dones, 0.9, backend="xla")
    np.testing.assert_array_equal(np.asarray(t_l), np.asarray(t_f))

    table2 = tab.qtable_update(table, boards, a_l, t_l, 0.1, probe=probe_l)
    packed2 = tabf.fast_update(packed, probe_f, a_f, t_f, 0.1, backend="xla")
    un = tabf.unpack_qtable(packed2)
    np.testing.assert_array_equal(np.asarray(un.key_lo), np.asarray(table2.key_lo))
    np.testing.assert_array_equal(np.asarray(un.key_hi), np.asarray(table2.key_hi))
    np.testing.assert_array_equal(np.asarray(un.q), np.asarray(table2.q))
    assert int(un.dropped) == int(table2.dropped)


def test_same_key_duplicates_combine_additively():
    """Two updates to the SAME state in one batch both apply (the legacy
    scatter-add semantics; delta vs the serial reference, documented)."""
    packed = tabf.packed_init(8)
    board = random_boards(jax.random.PRNGKey(4), 1)
    boards = jnp.concatenate([board, board])
    actions = jnp.asarray([1, 1], jnp.int32)
    targets = jnp.asarray([1.0, 3.0], jnp.float32)
    _, probe = tabf.fast_choose_actions_probed(
        packed, boards, 0.0, jax.random.PRNGKey(0), backend="xla"
    )
    packed = tabf.fast_update(packed, probe, actions, targets, 0.5, backend="xla")
    q = tabf.fast_lookup(packed, board)
    # Both TDs computed from the pre-update Q (= 0): 0.5*1 + 0.5*3 = 2.
    np.testing.assert_allclose(np.asarray(q)[0, 1], 2.0)
    assert int(packed.dropped) == 0


def test_claim_race_lowest_index_wins_and_loser_drops():
    """Two DIFFERENT fresh states racing for one free slot: the lowest
    batch index claims it; the loser drops and is counted (the legacy
    claim-verify semantics with a deterministic winner — documented)."""
    # capacity 16 = ONE bucket: every key hashes to it, and an empty table
    # gives both entries first_free = slot 0.
    packed = tabf.packed_init(4)
    boards = random_boards(jax.random.PRNGKey(5), 2)
    lo, hi = tab.pack_board(boards)
    assert not bool((lo[0] == lo[1]) & (hi[0] == hi[1]))
    actions = jnp.asarray([2, 3], jnp.int32)
    targets = jnp.asarray([4.0, 8.0], jnp.float32)
    _, probe = tabf.fast_choose_actions_probed(
        packed, boards, 0.0, jax.random.PRNGKey(0), backend="xla"
    )
    packed = tabf.fast_update(packed, probe, actions, targets, 1.0, backend="xla")
    q = tabf.fast_lookup(packed, boards)
    np.testing.assert_allclose(np.asarray(q)[0], [0, 0, 4.0, 0])
    np.testing.assert_allclose(np.asarray(q)[1], [0, 0, 0, 0])  # dropped
    assert int(packed.dropped) == 1


def test_full_bucket_drops_and_counts():
    packed = tabf.packed_init(4)  # one bucket of 16
    key = jax.random.PRNGKey(6)
    boards = random_boards(key, 16)
    # Fill all 16 slots one batch-entry at a time (sequential steps).
    for i in range(16):
        _, probe = tabf.fast_choose_actions_probed(
            packed, boards[i : i + 1], 0.0, key, backend="xla"
        )
        packed = tabf.fast_update(
            packed, probe, jnp.zeros((1,), jnp.int32),
            jnp.ones((1,), jnp.float32), 1.0, backend="xla",
        )
    assert int(jnp.sum(packed.occupied)) == 16
    fresh = random_boards(jax.random.fold_in(key, 7), 1)
    _, probe = tabf.fast_choose_actions_probed(
        packed, fresh, 0.0, key, backend="xla"
    )
    before = int(packed.dropped)
    packed = tabf.fast_update(
        packed, probe, jnp.zeros((1,), jnp.int32),
        jnp.ones((1,), jnp.float32), 1.0, backend="xla",
    )
    assert int(packed.dropped) == before + 1


@pytest.mark.parametrize("n", [1, 5, 33])
def test_kernels_bit_exact_vs_xla_twins(n):
    """The real Pallas kernels (interpret mode) == the jnp twins."""
    rng = np.random.default_rng(n)
    nb = 32  # buckets
    data = jnp.asarray(
        rng.integers(0, 2**32, (nb + 1, tk.ROW), dtype=np.uint32)
    )
    buckets = jnp.asarray(rng.integers(0, nb, (n,), dtype=np.int32))
    np.testing.assert_array_equal(
        np.asarray(tk.bucket_gather(data, buckets, interpret=True)),
        np.asarray(tk.bucket_gather_xla(data, buckets)),
    )
    ids = jnp.asarray(
        np.concatenate([rng.choice(nb, n - n // 2, replace=False),
                        np.full((n // 2,), nb)]).astype(np.int32)
    )
    rows = jnp.asarray(
        rng.integers(0, 2**32, (n, tk.BUCKET, tk.WIDTH), dtype=np.uint32)
    )
    out_k = tk.bucket_scatter(jnp.array(data), ids, rows, interpret=True)
    out_x = tk.bucket_scatter_xla(jnp.array(data), ids, rows)
    # Trash row (last) is excluded: duplicate writes land there in
    # unspecified order by contract.
    np.testing.assert_array_equal(np.asarray(out_k)[:-1], np.asarray(out_x)[:-1])


def test_fast_step_interpret_backend_bit_exact():
    """A full choose+targets+update through the REAL kernels (interpret)
    equals the xla backend bit-for-bit — collisions included, because the
    resolve logic is shared and the scatter contract pre-deduplicates."""
    key = jax.random.PRNGKey(8)
    _, packed = populated_pair(key, capacity_log2=8, n_seed=40)
    boards = random_boards(jax.random.fold_in(key, 1), 24)
    nxt = random_boards(jax.random.fold_in(key, 2), 24)
    rewards = jax.random.normal(jax.random.fold_in(key, 3), (24,))
    dones = jnp.arange(24) % 4 == 0

    outs = {}
    for backend in ("xla", "interpret"):
        p = jax.tree.map(jnp.copy, packed)
        a, probe = tabf.fast_choose_actions_probed(p, boards, 0.3, key, backend=backend)
        t = tabf.fast_targets(p, rewards, nxt, dones, 0.9, backend=backend)
        p = tabf.fast_update(p, probe, a, t, 0.1, backend=backend)
        outs[backend] = (np.asarray(a), np.asarray(t), np.asarray(p.data[:-1]),
                         int(p.dropped))
    for x, y in zip(outs["xla"], outs["interpret"]):
        np.testing.assert_array_equal(x, y)


def test_train_chunk_runs_on_packed_backends():
    """End-to-end train_chunk on the packed table (xla + interpret) on the
    CPU test platform; metrics sane and states get inserted."""
    from tpu2048.env import EnvConfig
    from tpu2048.training.tabular import (
        TabularTrainConfig,
        init_train_state,
        resolve_table_backend,
        train_chunk,
    )

    for backend in ("xla", "interpret"):
        config = TabularTrainConfig(
            agent=tab.TabularConfig(capacity_log2=10, total_epochs=10),
            env=EnvConfig(reward="simple"),
            batch_size=8,
            steps_per_chunk=12,
            table_backend=backend,
        )
        assert resolve_table_backend(config) == backend
        state = init_train_state(config)
        state, eps = jax.jit(lambda s, c=config: train_chunk(c, s))(state)
        assert int(state.env_steps) == 8 * 12
        assert int(jnp.sum(state.table.occupied)) > 0
        assert float(eps) <= 1.0

    # auto on CPU resolves to the packed xla twin.
    auto = TabularTrainConfig(table_backend="auto")
    assert resolve_table_backend(auto) == "xla"


def test_packed_save_restores_to_legacy_layout(tmp_path):
    """Training on the packed table saves the canonical .npz layout that
    qtable_lookup / eval --policy tabular consume."""
    key = jax.random.PRNGKey(11)
    table, packed = populated_pair(key, capacity_log2=10, n_seed=50)
    path = str(tmp_path / "q.npz")
    tab.save_qtable(path, tabf.unpack_qtable(packed))
    loaded = tab.load_qtable(path)
    boards = random_boards(key, 50)[:8]
    np.testing.assert_array_equal(
        np.asarray(tab.qtable_lookup(loaded, boards)),
        np.asarray(tabf.fast_lookup(packed, boards)),
    )
