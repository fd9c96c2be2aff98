"""Checkpoint / resume via orbax.

Parity with the reference's `.tar` checkpoints (`DS_NeRF/run.py:1043-1053`,
auto-resume `run.py:1647-1670`): saves {step, params, opt_state} every
`i_weights` steps under `basedir/expname/ckpt/`, restores the newest on startup
unless `no_reload`, or a pinned path via `ft_path`.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from mvip_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, state: TrainState) -> None:
        step = int(state.step)
        self._mgr.save(
            step, args=ocp.args.StandardSave(jax.tree.map(np.asarray, state))
        )
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: TrainState, step: Optional[int] = None) -> TrainState:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))
        return jax.tree.map(lambda x: x, restored)

    def close(self):
        self._mgr.close()


def restore_from_path(path: str, template: TrainState) -> TrainState:
    """Pin a specific checkpoint (reference `--ft_path`, `run.py:1546-1547`).

    `path` is either a checkpoint-manager step dir (`.../ckpt/<step>`) or the
    manager dir itself (restores the newest)."""
    path = os.path.abspath(path)
    base, leaf = os.path.dirname(path), os.path.basename(path)
    if leaf.isdigit():
        mgr = CheckpointManager(base)
        try:
            return mgr.restore(template, step=int(leaf))
        finally:
            mgr.close()
    mgr = CheckpointManager(path)
    try:
        return mgr.restore(template)
    finally:
        mgr.close()
