"""Checkpoint / resume — Orbax full-train-state persistence.

TPU-native replacement for the reference's pickle+h5 checkpointing
(/root/reference/Deep_QLearning/main_dir/Dqn8TestNOPERCNN.py:402-584):
``save_agent_state`` pickled the model (.h5), the whole replay memory, the
schedule variables, and the metric arrays into four files per episode tag.
Here the ENTIRE :class:`tpu2048.training.dqn.DQNLoopState` pytree — online
+ target params, optimizer state (incl. the mutable learning rate), replay
buffer shards, dedup caches, env state, PRNG keys, schedule counters, and
running metric accumulators — is one Orbax step checkpoint, so a restored
run continues bit-for-bit (metric histories included, matching the
reference's resume of its plot arrays, Dqn8:475-487).

API surface mapping:
* ``save_agent_state``/``load_agent_state`` (episode-tagged, Dqn8:410-487)
  -> :meth:`CheckpointManager.save` / :meth:`CheckpointManager.restore`
* ``save/load_agent_state_checkpoint`` (named rollback checkpoints,
  Dqn8:506-584) -> :meth:`CheckpointManager.save_named` /
  :meth:`restore_named`
* milestone model saves (mainDQL:254-262) -> :meth:`save_named` with a
  tile-tagged name.

Multi-host: only process 0 writes (Orbax handles coordination when
``jax.distributed`` is initialized).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Step-tagged + named checkpoints over one directory."""

    def __init__(self, directory: str, max_to_keep: Optional[int] = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            os.path.join(self.directory, "steps"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        self._named = ocp.StandardCheckpointer()

    # -- step-tagged (save_agent_state, Dqn8:410-440) -----------------------

    def save(self, step: int, state: Any, wait: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def restore(self, step: int, template: Any) -> Any:
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return list(self._mgr.all_steps())

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    # -- named (save_agent_state_checkpoint, Dqn8:506-584) ------------------

    def _named_path(self, name: str) -> str:
        return os.path.join(self.directory, "named", name)

    def save_named(self, name: str, state: Any) -> None:
        path = self._named_path(name)
        if os.path.exists(path):
            # StandardCheckpointer refuses to overwrite; named checkpoints
            # are rolling (reference overwrites block_checkpoint too).
            import shutil

            shutil.rmtree(path)
        self._named.save(path, state)
        self._named.wait_until_finished()

    def restore_named(self, name: str, template: Any) -> Any:
        return self._named.restore(
            self._named_path(name), target=template
        )

    def has_named(self, name: str) -> bool:
        return os.path.isdir(self._named_path(name))

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
        self._named.close()


def abstract_like(state: Any, device=None) -> Any:
    """ShapeDtypeStruct template for restoring without a concrete state.

    With ``device``, every leaf is annotated with a single-device sharding
    so Orbax materializes the restore THERE (e.g. host CPU) instead of on
    the default accelerator.
    """
    sharding = (
        jax.sharding.SingleDeviceSharding(device) if device is not None
        else None
    )
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
        if hasattr(x, "shape")
        else x,
        state,
    )


def restore_params_only(
    directory: str, step: Optional[int], config, named: Optional[str] = None
) -> Any:
    """Restore just the online-network params from a full-state checkpoint.

    ``eval``/``demo`` only need the CNN weights, but a step checkpoint
    holds the whole ~2 GB loop state (replay buffer included). Through a
    tunneled TPU runtime, materializing the template and the restore on
    the accelerator moves ~4 GB over the link; this path instead (a)
    builds a zero-compute abstract template via ``jax.eval_shape``, (b)
    restores the whole tree onto HOST CPU from local disk, and (c) ships
    only the params to the accelerator.

    ``named`` selects a NAMED checkpoint (milestone tiers ``tile_512_*``/
    ``tile_1024_*``/``tile_2048_*``, rollback ``block_checkpoint``)
    instead of a step — the reference's GameDemo loads exactly such a
    milestone model artifact (GameDemo.py:208).

    Returns ``(step_or_name, params_on_default_device)``.
    """
    from tpu2048.training.dqn import init_loop_state  # noqa: PLC0415

    mgr = CheckpointManager(directory)
    try:
        cpu = jax.devices("cpu")[0]
        template = abstract_like(
            jax.eval_shape(lambda: init_loop_state(config)[1]), device=cpu
        )
        if named is not None:
            if not mgr.has_named(named):
                have = sorted(
                    os.listdir(os.path.join(mgr.directory, "named"))
                ) if os.path.isdir(
                    os.path.join(mgr.directory, "named")
                ) else []
                raise FileNotFoundError(
                    f"no named checkpoint {named!r} in {directory} "
                    f"(available: {have})"
                )
            state = mgr.restore_named(named, template)
            step = named
        else:
            if step is None:
                step = mgr.latest_step()
            if step is None:
                return None, None
            state = mgr.restore(step, template)
    finally:
        mgr.close()
    # Explicit target device: device_put without one keeps the CPU
    # placement from the restore, and a later jit would then commit the
    # whole eval to the CPU backend (where the Pallas kernel refuses to
    # lower outside interpret mode).
    return step, jax.device_put(state.agent.params, jax.devices()[0])
