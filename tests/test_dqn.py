"""DQN model/agent tests: topology, target math vs a NumPy oracle,
epsilon/LR schedules, action selection, dedup (SURVEY.md §4 item 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu2048.agents.dqn import (
    DQNConfig,
    create_train_state,
    current_lr,
    dedup_init,
    dedup_mask,
    dqn_targets,
    epsilon_value,
    make_optimizer,
    maybe_decay_lr,
    select_actions,
    train_step,
    update_target,
)
from tpu2048.models.dqn import DQNCNN, create_model, init_params

TINY = DQNConfig(
    features=8, hidden=16, dropout=0.0, num_blocks=2, bf16=False,
    batch_size=8, memory_size=256,
)


def tiny_state(seed=0):
    return create_train_state(TINY, jax.random.PRNGKey(seed))


def rand_boards(key, n):
    return jax.random.randint(key, (n, 4, 4), 0, 8, dtype=jnp.int32).astype(
        jnp.int8
    )


def test_full_model_parameter_count():
    """Reference claims ~198M params for online+target (Dqn8:17); each
    network is 96.77M with the exact reference topology."""
    model = create_model(DQNConfig())
    shapes = jax.eval_shape(
        lambda k: model.init({"params": k}, jnp.zeros((1, 4, 4), jnp.int8)),
        jax.random.PRNGKey(0),
    )["params"]
    n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    # conv stacks: 16->2048 then 2048->2048 twice, kernels 1/2/3/4 at 512
    # filters each; dense 32768->1024; head 1024->4.
    expected = (
        (1 + 4 + 9 + 16) * 16 * 512 + 4 * 512      # block0 + biases
        + 2 * ((1 + 4 + 9 + 16) * 2048 * 512 + 4 * 512)
        + 32768 * 1024 + 1024
        + 1024 * 4 + 4
    )
    assert n == expected
    assert 95e6 < n < 100e6


def test_model_output_shape_and_dtype():
    model = create_model(TINY)
    params = init_params(model, jax.random.PRNGKey(0))
    q = model.apply({"params": params}, rand_boards(jax.random.PRNGKey(1), 5))
    assert q.shape == (5, 4)
    assert q.dtype == jnp.float32


def test_dropout_active_only_in_train_mode():
    cfg = DQNConfig(features=8, hidden=512, dropout=0.5, num_blocks=1, bf16=False)
    model = create_model(cfg)
    params = init_params(model, jax.random.PRNGKey(0))
    b = rand_boards(jax.random.PRNGKey(1), 3)
    q1 = model.apply({"params": params}, b, train=False)
    q2 = model.apply({"params": params}, b, train=False)
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))
    q3 = model.apply(
        {"params": params}, b, train=True, rngs={"dropout": jax.random.PRNGKey(2)}
    )
    q4 = model.apply(
        {"params": params}, b, train=True, rngs={"dropout": jax.random.PRNGKey(3)}
    )
    assert not np.array_equal(np.asarray(q3), np.asarray(q4))


def test_dqn_targets_match_numpy_oracle():
    model, state = tiny_state()
    batch = {
        "board": rand_boards(jax.random.PRNGKey(1), 6),
        "next_board": rand_boards(jax.random.PRNGKey(2), 6),
        "action": jnp.asarray([0, 1, 2, 3, 0, 1]),
        "reward": jnp.asarray([1.0, -10.0, 4.0, 0.0, 8.0, 2.0]),
        "done": jnp.asarray([False, False, True, False, True, False]),
    }
    targets = np.asarray(dqn_targets(TINY, model, state.target_params, batch))
    next_q = np.asarray(
        model.apply({"params": state.target_params}, batch["next_board"])
    )
    for i in range(6):
        if bool(batch["done"][i]):
            want = float(batch["reward"][i])  # terminals bootstrap to r
        else:
            want = float(batch["reward"][i]) + TINY.gamma * next_q[i].max()
        assert targets[i] == pytest.approx(want, rel=1e-5)


def test_train_step_loss_and_priorities():
    model, state = tiny_state()
    tx = make_optimizer(TINY)
    batch = {
        "board": rand_boards(jax.random.PRNGKey(1), 8),
        "next_board": rand_boards(jax.random.PRNGKey(2), 8),
        "action": jnp.asarray([0, 1, 2, 3, 0, 1, 2, 3]),
        "reward": jnp.linspace(-5, 5, 8),
        "done": jnp.asarray([False] * 7 + [True]),
    }
    q_before = np.asarray(
        model.apply({"params": state.params}, batch["board"])
    )
    targets = np.asarray(dqn_targets(TINY, model, state.target_params, batch))
    new_state, metrics = jax.jit(
        lambda s, b: train_step(TINY, model, tx, s, b)
    )(state, batch)
    # Loss = mean((t - q_a)^2) / 4 (reference full-matrix MSE, Dqn8:380).
    q_a = q_before[np.arange(8), np.asarray(batch["action"])]
    want_loss = float(np.mean((targets - q_a) ** 2) / 4.0)
    assert float(metrics["loss"]) == pytest.approx(want_loss, rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(metrics["td_errors"]), np.abs(targets - q_a), rtol=1e-5
    )
    # Parameters moved; target params did not.
    moved = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, new_state.params
    )
    assert max(jax.tree.leaves(moved)) > 0
    same = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        state.target_params,
        new_state.target_params,
    )
    assert all(jax.tree.leaves(same))
    assert int(new_state.train_steps) == 1


def test_update_target_syncs():
    model, state = tiny_state()
    tx = make_optimizer(TINY)
    batch = {
        "board": rand_boards(jax.random.PRNGKey(1), 8),
        "next_board": rand_boards(jax.random.PRNGKey(2), 8),
        "action": jnp.zeros(8, jnp.int32),
        "reward": jnp.ones(8),
        "done": jnp.zeros(8, bool),
    }
    state, _ = train_step(TINY, model, tx, state, batch)
    state = update_target(state)
    same = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        state.params,
        state.target_params,
    )
    assert all(jax.tree.leaves(same))


def test_epsilon_schedule():
    cfg = DQNConfig()
    assert float(epsilon_value(cfg, jnp.int32(0))) == pytest.approx(0.9)
    # eps = 0.9 * 0.9999^10000 ~ 0.331
    assert float(epsilon_value(cfg, jnp.int32(10_000))) == pytest.approx(
        0.9 * 0.9999**10_000, rel=1e-3  # f32 pow precision
    )
    assert float(epsilon_value(cfg, jnp.int32(10_000_000))) == pytest.approx(
        cfg.epsilon_min
    )


def test_lr_decay_hook():
    _, state = tiny_state()
    assert float(current_lr(state)) == pytest.approx(5e-5)
    state = maybe_decay_lr(TINY, state, jnp.asarray(False))
    assert float(current_lr(state)) == pytest.approx(5e-5)
    state = maybe_decay_lr(TINY, state, jnp.asarray(True))
    assert float(current_lr(state)) == pytest.approx(5e-5 * 0.98)
    # Several qualifying episode-enders in one vector step decay once
    # EACH (the reference fires once per episode, Dqn8:284-285 + :299-309).
    state = maybe_decay_lr(TINY, state, jnp.asarray(5, jnp.int32))
    assert float(current_lr(state)) == pytest.approx(5e-5 * 0.98**6, rel=1e-5)
    # Floor at 1e-6.
    for _ in range(300):
        state = maybe_decay_lr(TINY, state, jnp.asarray(True))
    assert float(current_lr(state)) == pytest.approx(1e-6)
    # The floor only clamps the DECAY path: an LR set below lr_min (e.g. a
    # fine-tune launched with --alpha 5e-7) must pass through untouched
    # when no episode qualifies.
    from tpu2048.agents.dqn import set_lr

    state = set_lr(state, 5e-7)
    state = maybe_decay_lr(TINY, state, jnp.asarray(0, jnp.int32))
    assert float(current_lr(state)) == pytest.approx(5e-7)


def test_select_actions_legal_restriction():
    model, state = tiny_state()
    boards = rand_boards(jax.random.PRNGKey(3), 16)
    legal = jnp.zeros((16, 4), bool).at[:, 2].set(True)  # only action 2 legal
    restrict = jnp.ones((16,), bool)
    # Greedy (eps=0): must pick the only legal action.
    acts = select_actions(
        model, state.params, boards, legal, restrict, 0.0, jax.random.PRNGKey(0)
    )
    assert (np.asarray(acts) == 2).all()
    # Random (eps=1) with restriction: still only action 2.
    acts = select_actions(
        model, state.params, boards, legal, restrict, 1.0, jax.random.PRNGKey(1)
    )
    assert (np.asarray(acts) == 2).all()
    # Unrestricted random: all actions appear.
    acts = select_actions(
        model,
        state.params,
        boards,
        legal,
        jnp.zeros((16,), bool),
        1.0,
        jax.random.PRNGKey(2),
    )
    assert len(set(np.asarray(acts).tolist())) > 1


def test_dedup_mask():
    dd = dedup_init(2)
    b0 = rand_boards(jax.random.PRNGKey(0), 2)
    b1 = rand_boards(jax.random.PRNGKey(1), 2)
    dones = jnp.zeros(2, bool)
    # First three saves always pass.
    for _ in range(3):
        save, dd = dedup_mask(dd, b0, b1, dones)
        assert np.asarray(save).all()
    # Now (b0, b1) equals the 2-back saved pair -> skip.
    save, dd = dedup_mask(dd, b0, b1, dones)
    assert not np.asarray(save).any()
    assert not np.asarray(dd.last_saved).any()
    # Terminal always saves.
    save, dd = dedup_mask(dd, b0, b1, jnp.ones(2, bool))
    assert np.asarray(save).all()
    # A different pair saves.
    b2 = rand_boards(jax.random.PRNGKey(2), 2)
    save, dd = dedup_mask(dd, b2, b1, dones)
    assert np.asarray(save).all()


def test_fused_conv_block_matches_four_convs():
    """The single 4x4-conv fusion is algebraically exact vs the literal
    four parallel SAME convs."""
    from tpu2048.models.dqn import MultiKernelConvBlock

    x = jax.random.normal(jax.random.PRNGKey(0), (3, 4, 4, 16))
    fused = MultiKernelConvBlock(features=32, dtype=jnp.float32, fused=True)
    naive = MultiKernelConvBlock(features=32, dtype=jnp.float32, fused=False)
    params = fused.init(jax.random.PRNGKey(1), x)
    y_fused = fused.apply(params, x)
    y_naive = naive.apply(params, x)  # identical param tree
    np.testing.assert_allclose(
        np.asarray(y_fused), np.asarray(y_naive), rtol=1e-5, atol=1e-5
    )


def test_create_model_defaults_unfused_without_attr():
    """A duck-typed config WITHOUT fused_conv must build the unfused model
    (the fused variant measured 1.77x slower; DQNConfig defaults it off —
    VERDICT r4 #5)."""
    from types import SimpleNamespace

    cfg = SimpleNamespace(
        features=8, hidden=16, dropout=0.5, num_blocks=1, bf16=False
    )
    assert create_model(cfg).fused is False


def test_checked_wrapper_catches_nan():
    from tpu2048.utils import checked

    import jax.numpy as _jnp

    def bad(x):
        return _jnp.log(x)  # NaN for negative input

    f = checked(jax.jit(bad))
    f(_jnp.asarray([1.0, 2.0]))  # fine
    import pytest as _pytest

    with _pytest.raises(Exception):
        f(_jnp.asarray([-1.0]))
