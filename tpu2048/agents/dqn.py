"""DQN agent: pure-functional actor + learner.

TPU-native re-design of the reference ``DQNAgent``
(/root/reference/Deep_QLearning/main_dir/Dqn8TestNOPERCNN.py:248-400). The
agent is a pytree (:class:`DQNTrainState`: online params, target params,
optimizer state, epsilon step counter, mutable learning rate) plus pure
functions:

* :func:`select_actions` — batched ``act`` (Dqn8:312-324) fused with the
  driver's ``act_ripetitive`` override (mainDQL_CNN_step2.py:176-185,
  Dqn8:326-336): envs whose previous transition was a dedup-skip act with
  the legal-move restriction; others act unrestricted. One forward pass
  serves the whole batch.
* :func:`train_step` — the ``replay`` update (Dqn8:351-400): batch from
  replay memory, online net forward (train=True, dropout active under an
  explicit PRNG), target net forward, vanilla-DQN targets
  (``r + gamma * max target_q``, terminals bootstrap to ``r``), MSE over
  the full (B, 4) Q-matrix — only taken-action cells carry gradient,
  scaled 1/4, kept for learning-curve parity (SURVEY.md §7) — Adam step,
  |TD| -> priorities. Importance weights are computed by the sampler and
  discarded, like the reference (Dqn8:357).
* :func:`update_epsilon_step` / :func:`epsilon_value` — per-step
  exponential decay ``max(eps_min, eps0 * decay**steps)`` (Dqn8:341-343);
  the counter advances by B per vector step so the schedule matches the
  reference in per-experience units.
* :func:`maybe_decay_lr` — the x0.98-on-1024 LR hook (Dqn8:299-309) using
  ``optax.inject_hyperparams`` so the learning rate is mutable train state.
* :func:`dedup_mask` — ``remember``'s skip rule (Dqn8:280-297): drop a
  transition when (s, s') equals the same env's transition two saves back,
  unless terminal; per-env caches replace the reference's global
  ``get_third_last`` (a misnomer for the 2-back entry, Dqn8:114-117).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from tpu2048.models.dqn import DQNCNN, create_model, init_params


@dataclasses.dataclass(frozen=True)
class DQNConfig:
    """Hyperparameters; defaults = the run of record (Dqn8:249, Dqn8:203)."""

    gamma: float = 0.99
    epsilon: float = 0.9
    epsilon_min: float = 0.001
    epsilon_decay: float = 0.9999
    decay_episodes: int = 200  # kept for config parity (epsilon_decay1)
    batch_size: int = 64
    memory_size: int = 50_000
    alpha: float = 0.0
    beta: float = 1.0
    beta_increment: float = 1e-5
    learning_rate: float = 5e-5
    lr_decay_factor: float = 0.98  # Dqn8:302
    lr_min: float = 1e-6
    lr_decay_tile: int = 1024  # remember() arms the hook at >=1024 (Dqn8:284)
    priority_epsilon: float = 1e-6  # Dqn8:97
    dedup: bool = True
    # Network (Dqn8:209-246).
    features: int = 2048
    hidden: int = 1024
    dropout: float = 0.5
    num_blocks: int = 3
    bf16: bool = True
    fused_conv: bool = False  # single-4x4-conv fusion: algebraically exact
    # but the per-apply weight assembly (~120 MB scatter at features=2048)
    # costs more than the saved MXU launches — measured slower in the real
    # training loop; kept as an option for small-channel configs


@struct.dataclass
class DQNTrainState:
    params: dict
    target_params: dict
    opt_state: optax.OptState
    step_counter: jax.Array  # () int32 — epsilon decay steps (act calls)
    train_steps: jax.Array  # () int32 — gradient updates taken
    rng: jax.Array  # learner PRNG (dropout, sampling)


def make_optimizer(config: DQNConfig) -> optax.GradientTransformation:
    # eps=1e-7: the reference compiles keras Adam with defaults
    # (Dqn8:229), whose epsilon is 1e-7; optax's default is 1e-8.
    # Plain injection (no static_args): inject_hyperparams already puts
    # every numeric default (b1, b2, eps, eps_root) into
    # opt_state.hyperparams, so overriding eps here keeps the checkpoint
    # pytree identical to what earlier runs saved.
    return optax.inject_hyperparams(optax.adam)(
        learning_rate=config.learning_rate, eps=1e-7
    )


def create_train_state(config: DQNConfig, key) -> Tuple[DQNCNN, DQNTrainState]:
    k_init, k_rng = jax.random.split(key)
    model = create_model(config)
    params = init_params(model, k_init)
    tx = make_optimizer(config)
    return model, DQNTrainState(
        params=params,
        target_params=jax.tree.map(jnp.copy, params),
        opt_state=tx.init(params),
        step_counter=jnp.zeros((), jnp.int32),
        train_steps=jnp.zeros((), jnp.int32),
        rng=k_rng,
    )


def current_lr(state: DQNTrainState) -> jax.Array:
    return state.opt_state.hyperparams["learning_rate"]


def set_lr(state: DQNTrainState, lr) -> DQNTrainState:
    opt_state = state.opt_state
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=opt_state)


def maybe_decay_lr(config: DQNConfig, state: DQNTrainState, trigger) -> DQNTrainState:
    """LR <- max(lr * 0.98**n, 1e-6) for ``n`` qualifying episode ends.

    The reference arms ``change_lr`` in ``remember`` whenever an episode
    ends with max(state) >= 1024 (Dqn8:284-285) and the driver consumes
    the flag once per env step (mainDQL:229 -> Dqn8:299-309), i.e. the
    decay fires exactly once PER QUALIFYING EPISODE. With B vectorized
    envs several qualifying episodes can end in one step, so ``trigger``
    is a count (or a bool for the single-env case) and the factor is
    applied that many times, floored at ``lr_min``.
    """
    n = jnp.asarray(trigger).astype(jnp.float32)
    lr = current_lr(state)
    decayed = jnp.maximum(
        lr * jnp.power(config.lr_decay_factor, n), config.lr_min
    )
    # Only the decay path clamps at lr_min (Dqn8:303-306); with zero
    # triggers the LR must pass through untouched, or a run launched with
    # alpha < lr_min would be silently raised to the floor.
    new_lr = jnp.where(n > 0, decayed, lr)
    return set_lr(state, new_lr)


def epsilon_value(config: DQNConfig, step_counter) -> jax.Array:
    """``max(eps_min, eps0 * decay**steps)`` (Dqn8:341-343)."""
    return jnp.maximum(
        config.epsilon_min,
        config.epsilon
        * jnp.power(config.epsilon_decay, step_counter.astype(jnp.float32)),
    )


def update_target(state: DQNTrainState) -> DQNTrainState:
    """Hard sync (``update_target_model``, Dqn8:338-339)."""
    return state.replace(target_params=jax.tree.map(jnp.copy, state.params))


def select_actions(
    model: DQNCNN,
    params,
    boards,
    legal_mask,
    restrict_to_legal,
    epsilon,
    key,
):
    """Batched epsilon-greedy action selection.

    Args:
      boards: (B, 4, 4) int8.
      legal_mask: (B, 4) bool — legal moves of each board.
      restrict_to_legal: (B,) bool — envs using ``act_ripetitive``
        semantics (previous remember was a dedup skip, mainDQL:183-185).
      epsilon: scalar exploration rate.
      key: PRNG key.

    Returns:
      (B,) int32 actions.
    """
    b = boards.shape[0]
    k_explore, k_rand, k_rand_legal = jax.random.split(key, 3)
    q = model.apply({"params": params}, boards, train=False)  # (B, 4)

    # Greedy: plain argmax vs legal-restricted argmax (Dqn8:323,332-336).
    greedy_any = jnp.argmax(q, axis=-1)
    neg = jnp.full_like(q, -jnp.inf)
    q_legal = jnp.where(legal_mask, q, neg)
    has_legal = jnp.any(legal_mask, axis=-1)
    greedy_legal = jnp.where(
        has_legal, jnp.argmax(q_legal, axis=-1), greedy_any
    )
    greedy = jnp.where(restrict_to_legal, greedy_legal, greedy_any)

    # Random: uniform over 4 vs uniform over legal (Dqn8:319,328).
    rand_any = jax.random.randint(k_rand, (b,), 0, 4)
    u = jax.random.uniform(k_rand_legal, (b,))
    n_legal = jnp.sum(legal_mask.astype(jnp.int32), axis=-1)
    pick = jnp.floor(u * jnp.maximum(n_legal, 1)).astype(jnp.int32)
    csum = jnp.cumsum(legal_mask.astype(jnp.int32), axis=-1)
    rand_legal = jnp.argmax(
        (csum == pick[:, None] + 1) & legal_mask, axis=-1
    ).astype(jnp.int32)
    rand_legal = jnp.where(has_legal, rand_legal, rand_any)
    rand = jnp.where(restrict_to_legal, rand_legal, rand_any)

    explore = jax.random.uniform(k_explore, (b,)) < epsilon
    return jnp.where(explore, rand, greedy.astype(jnp.int32)).astype(jnp.int32)


def dqn_targets(config: DQNConfig, model: DQNCNN, target_params, batch):
    """Vanilla-DQN targets (Dqn8:371-376)."""
    next_q = model.apply(
        {"params": target_params}, batch["next_board"], train=False
    )
    bootstrap = jnp.max(next_q, axis=-1)
    return batch["reward"] + config.gamma * bootstrap * (
        1.0 - batch["done"].astype(jnp.float32)
    )


def train_step(
    config: DQNConfig,
    model: DQNCNN,
    tx: optax.GradientTransformation,
    state: DQNTrainState,
    batch,
):
    """One gradient update on a sampled batch (Dqn8:351-400).

    Returns ``(new_state, metrics)`` where metrics carries the loss and the
    per-sample |TD| errors for priority updates.
    """
    rng, k_dropout = jax.random.split(state.rng)
    targets = dqn_targets(config, model, state.target_params, batch)

    def loss_fn(params):
        q = model.apply(
            {"params": params},
            batch["board"],
            train=True,
            rngs={"dropout": k_dropout},
        )  # (B, 4)
        q_taken = jnp.take_along_axis(
            q, batch["action"][:, None], axis=-1
        )[:, 0]
        # Full-matrix MSE where targets == stop_grad(q) off the taken
        # action: value AND gradient identical to the reference's
        # tf.reduce_mean(square(targets - q_values)) (Dqn8:371-380) — only
        # taken-action cells contribute, scaled 1/4.
        loss = jnp.mean((targets - q_taken) ** 2) / q.shape[-1]
        return loss, q_taken

    (loss, q_taken), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    td_errors = jnp.abs(targets - q_taken)  # Dqn8:389
    new_state = state.replace(
        params=params,
        opt_state=opt_state,
        train_steps=state.train_steps + 1,
        rng=rng,
    )
    return new_state, {"loss": loss, "td_errors": td_errors}


# ---------------------------------------------------------------------------
# Transition dedup (remember, Dqn8:280-297)
# ---------------------------------------------------------------------------


@struct.dataclass
class DedupState:
    """Per-env cache of the last two SAVED (s, s') pairs."""

    s: jax.Array  # (B, 2, 4, 4) int8 — slot 0 = most recent save
    ns: jax.Array  # (B, 2, 4, 4) int8
    saved_count: jax.Array  # (B,) int32
    last_saved: jax.Array  # (B,) bool — drives act_ripetitive next step


def dedup_init(batch_size: int) -> DedupState:
    # Distinct arrays (no aliasing) so the loop state is donatable.
    return DedupState(
        s=jnp.zeros((batch_size, 2, 4, 4), jnp.int8),
        ns=jnp.zeros((batch_size, 2, 4, 4), jnp.int8),
        saved_count=jnp.zeros((batch_size,), jnp.int32),
        last_saved=jnp.ones((batch_size,), bool),
    )


def dedup_mask(
    dd: DedupState, boards, next_boards, dones, enabled: bool = True
) -> Tuple[jax.Array, DedupState]:
    """Which transitions to save, and the updated cache.

    Reference rule (Dqn8:283-297): always save the first 3 entries and all
    terminals; otherwise skip when (s, s') equals the entry two saves back
    (``get_third_last`` — actually index nb_entries-2).
    """
    if not enabled:
        b = boards.shape[0]
        save = jnp.ones((b,), bool)
    else:
        two_back_s = dd.s[:, 1]
        two_back_ns = dd.ns[:, 1]
        is_equal = jnp.all(boards == two_back_s, axis=(-1, -2)) & jnp.all(
            next_boards == two_back_ns, axis=(-1, -2)
        )
        save = dones | ~is_equal | (dd.saved_count < 3)

    s = jnp.where(
        save[:, None, None, None],
        jnp.stack([boards, dd.s[:, 0]], axis=1),
        dd.s,
    )
    ns = jnp.where(
        save[:, None, None, None],
        jnp.stack([next_boards, dd.ns[:, 0]], axis=1),
        dd.ns,
    )
    new_dd = DedupState(
        s=s,
        ns=ns,
        saved_count=dd.saved_count + save.astype(jnp.int32),
        last_saved=save,
    )
    return save, new_dd
