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


def abstract_like(state: Any) -> Any:
    """ShapeDtypeStruct template for restoring without a concrete state."""
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape")
        else x,
        state,
    )
