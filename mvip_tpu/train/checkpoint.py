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


def _restore_from_torch_tar(path: str, template: TrainState) -> TrainState:
    """Reference `.tar` checkpoint (`DS_NeRF/run.py:1043-1053`) -> TrainState.

    Only valid for the PE-MLP backbone (the reference's `--no_tcnn` model);
    param shapes are validated against the template so a backbone mismatch
    fails with a clear message instead of a tree error downstream. Optimizer
    moments restart (torch-Adam internals don't map to optax)."""
    from mvip_tpu.interop.torch_ckpt import import_reference_checkpoint

    data = import_reference_checkpoint(path)
    params = {"coarse": data["coarse"]}
    if "fine" in template.params:
        params["fine"] = data["fine"] if data["fine"] is not None else data["coarse"]
    t_leaves, t_def = jax.tree.flatten(template.params)
    i_leaves, i_def = jax.tree.flatten(params)
    if t_def != i_def or any(
        np.shape(a) != np.shape(b) for a, b in zip(t_leaves, i_leaves)
    ):
        raise ValueError(
            f"torch checkpoint {path} (inferred coarse {data['cfg']}, fine "
            f"{data['fine_cfg']}) does not match the configured model — "
            f"importing reference .tar files requires `--backbone mlp` with "
            f"matching netdepth/netwidth/netdepth_fine/netwidth_fine/multires"
        )
    import jax.numpy as jnp

    return template._replace(
        step=jnp.asarray(data["step"], jnp.int32),
        params=jax.tree.map(jnp.asarray, params),
    )


def restore_from_path(path: str, template: TrainState) -> TrainState:
    """Pin a specific checkpoint (reference `--ft_path`, `run.py:1546-1547`).

    `path` is either a checkpoint-manager step dir (`.../ckpt/<step>`), the
    manager dir itself (restores the newest), or a reference torch `.tar`
    file (imported via `mvip_tpu.interop`)."""
    path = os.path.abspath(path)
    if os.path.isfile(path):
        return _restore_from_torch_tar(path, template)
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
