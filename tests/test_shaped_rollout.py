"""Shaped-mode multi-step rollout kernel (VERDICT r4 #8).

The anti-stall counter (Game2048_env.py:110-127) is a function of the
RESOLVED action, which for the in-kernel random policy only exists inside
the kernel — so the lane moved in-kernel (ops/pallas_step.py
_env_step_core ``stall=``), and shaped configs now run the multi-step
rollout + latched random eval. Differential strategy: the pallas kernel
(interpret mode on CPU, external RNG) against the ``backend="lax"``
oracle, which recomputes the identical resolved action from the same bit
rows and steps the full shaped single-step path.

A shaped window maintains no reward lanes by design (shaped rewards are
host-side float shaping shared with the classic env); comparisons cover
the lanes the window DOES maintain — boards, merge score, episode steps,
stall lanes, done counts, and the reward-free eval latches.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpu2048.env import EnvConfig, SHAPED
from tpu2048.env import fast as fastlib


def shaped_cfg(batch, **kw):
    cfg = fastlib.for_backend(
        batch_size=batch, env_config=EnvConfig(reward=SHAPED)
    )
    assert cfg.shaped
    return dataclasses.replace(cfg, **kw) if kw else cfg


def common_lanes(state):
    return {
        "boards": np.asarray(state.boards),
        "score": np.asarray(state.score),
        "steps": np.asarray(state.episode_steps),
        "consec_action": np.asarray(state.consec_action),
        "consec_count": np.asarray(state.consec_count),
        "seed": int(state.seed),
    }


def test_shaped_rollout_matches_lax_oracle():
    b, k = 16, 24
    cfg = shaped_cfg(b)
    oracle = dataclasses.replace(cfg, backend="lax")
    key = jax.random.PRNGKey(0)
    s0 = fastlib.fast_reset(cfg, key, b)

    s_k, rsum_k, dcnt_k = fastlib.fast_rollout(cfg, s0, k)
    s_l, rsum_l, dcnt_l = fastlib.fast_rollout(
        oracle, jax.tree.map(jnp.copy, s0), k
    )
    for name, a in common_lanes(s_k).items():
        np.testing.assert_array_equal(a, common_lanes(s_l)[name], err_msg=name)
    np.testing.assert_array_equal(np.asarray(dcnt_k), np.asarray(dcnt_l))
    # Shaped windows maintain no reward sums on either backend.
    assert not np.asarray(rsum_k).any()
    assert not np.asarray(rsum_l).any()


def test_shaped_rollout_eval_latches_match_lax_oracle():
    b, k = 16, 16
    cfg = shaped_cfg(b)
    oracle = dataclasses.replace(cfg, backend="lax")
    key = jax.random.PRNGKey(3)
    s0 = fastlib.fast_reset(cfg, key, b)

    lat_k = fastlib.eval_latch_init(b)
    lat_l = fastlib.eval_latch_init(b)
    s_k = s0
    s_l = jax.tree.map(jnp.copy, s0)
    for _ in range(6):  # enough windows for most lanes to latch
        s_k, lat_k = fastlib.fast_rollout_eval(cfg, s_k, lat_k, k)
        s_l, lat_l = fastlib.fast_rollout_eval(oracle, s_l, lat_l, k)
    for name in ("latched", "score", "steps", "max_exp", "action_counts"):
        np.testing.assert_array_equal(
            np.asarray(getattr(lat_k, name)),
            np.asarray(getattr(lat_l, name)),
            err_msg=name,
        )
    for name, a in common_lanes(s_k).items():
        np.testing.assert_array_equal(a, common_lanes(s_l)[name], err_msg=name)
    assert int(jnp.sum(lat_k.latched)) > 0


def test_stall_cutoff_forces_done_in_kernel():
    """stall_force_done=0 makes every step trip the in-kernel cutoff
    (count >= 1 > 0), so every lane completes every step — pins that the
    force-done lane really is wired through the rollout kernel."""
    b, k = 8, 5
    cfg = shaped_cfg(b, stall_force_done=0)
    s0 = fastlib.fast_reset(cfg, jax.random.PRNGKey(1), b)
    _, _, dcnt = fastlib.fast_rollout(cfg, s0, k)
    np.testing.assert_array_equal(np.asarray(dcnt), np.full((b,), k))


def test_stall_counter_persists_unless_reset_shaping():
    """Faithful default: shaping lanes persist across auto-resets
    (Game2048_env.py:187-191); reset_shaping clears them on done."""
    b, k = 8, 4
    for reset_shaping in (False, True):
        cfg = shaped_cfg(b, stall_force_done=0, reset_shaping=reset_shaping)
        s0 = fastlib.fast_reset(cfg, jax.random.PRNGKey(2), b)
        s1, _, _ = fastlib.fast_rollout(cfg, s0, k)
        if reset_shaping:
            # Every step dones (cutoff 0) -> lanes cleared each step.
            np.testing.assert_array_equal(
                np.asarray(s1.consec_count), np.zeros((b,), np.int32)
            )
            np.testing.assert_array_equal(
                np.asarray(s1.consec_action), np.full((b,), -1, np.int32)
            )
        else:
            # Lanes persist through done: count stays >= 1.
            assert (np.asarray(s1.consec_count) >= 1).all()
            assert (np.asarray(s1.consec_action) >= 0).all()


def test_evaluate_random_shaped_routes_through_fast_path(monkeypatch):
    """The eval harness now sends shaped random eval to the rollout-kernel
    path (previously single-step only, VERDICT r4 weak #5)."""
    import importlib

    evmod = importlib.import_module("tpu2048.eval.evaluate")
    evaluate = evmod.evaluate
    random_legal_policy = evmod.random_legal_policy

    calls = []
    orig = evmod._evaluate_fast_random

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(evmod, "_evaluate_fast_random", spy)
    result = evaluate(
        random_legal_policy(),
        num_games=32,
        key=jax.random.PRNGKey(0),
        env_config=EnvConfig(reward=SHAPED),
        batch_size=32,
        max_steps=1500,
        engine="fast",
    )
    assert calls, "shaped random eval did not route to the rollout path"
    s = result.summary()
    assert s["games"] == 32
    assert s["length_mean"] > 10
    assert s["score_mean"] > 0
    assert max(int(t) for t in s["max_tile_distribution"]) >= 32
