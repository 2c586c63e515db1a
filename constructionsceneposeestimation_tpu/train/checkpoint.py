"""Training checkpoint/resume via orbax.

The reference's only resume mechanism is data-level (label-index scan,
generate_construction_data.py:1357-1367 — see io/resume.py); training-state
checkpointing is the TPU build's addition (SURVEY.md section 5): save/restore
of the full TrainState (params, optimizer state, step) with retention.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from . import loop


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3, save_every: int = 1000):
        self.directory = os.path.abspath(directory)
        self.save_every = save_every
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    def maybe_save(self, state: loop.TrainState, force: bool = False) -> bool:
        step = int(state.step)
        if not force and (self.save_every <= 0 or step % self.save_every != 0):
            return False
        if self._mgr.latest_step() == step:  # already saved (periodic + final)
            return False
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()
        return True

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: loop.TrainState,
                step: Optional[int] = None) -> loop.TrainState:
        """Restore into the structure/shardings of ``template``."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        restored = self._mgr.restore(
            step,
            args=ocp.args.StandardRestore(jax.tree_util.tree_map(
                ocp.utils.to_shape_dtype_struct, template)),
        )
        return restored

    def close(self) -> None:
        self._mgr.close()
