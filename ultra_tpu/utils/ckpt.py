"""Checkpointing: orbax-backed save/load of parameter pytrees and train
state, plus interop with the reference's .pth checkpoints.

Reference behavior mirrored (run.py:97-118): periodic epoch checkpoints,
best-by-validation-MRR selection and reload. Unlike the reference, the full
optimizer state round-trips, so interrupted runs resume exactly.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_pytree(path: str, tree: Any):
    ocp = _ocp()
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(tree), force=True)
    ckptr.wait_until_finished()


def load_pytree(path: str, like: Optional[Any] = None):
    ocp = _ocp()
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(path, target=jax.device_get(like))
    return ckptr.restore(path)


def load_model_checkpoint(path: str) -> dict:
    """Load model params from either a reference .pth (converted on the fly)
    or an ultra_tpu orbax directory."""
    if path.endswith(".pth"):
        from ultra_tpu.utils.torch_ckpt import convert_ultra_checkpoint, to_jax

        return to_jax(convert_ultra_checkpoint(path))
    tree = load_pytree(path)
    if isinstance(tree, dict) and "params" in tree:
        tree = tree["params"]
    return jax.tree.map(np.asarray, tree)


class BestModelTracker:
    """Keep epoch checkpoints, track the best validation metric, reload the
    winner at the end (run.py:97-118)."""

    def __init__(self, workdir: str):
        self.workdir = workdir
        self.best_metric = float("-inf")
        self.best_path: Optional[str] = None

    def save_epoch(self, epoch: int, state) -> str:
        path = os.path.join(self.workdir, f"model_epoch_{epoch}")
        save_pytree(path, {"params": state.params, "opt_state": state.opt_state})
        return path

    def update(self, epoch: int, metric: float, state):
        path = self.save_epoch(epoch, state)
        if metric > self.best_metric:
            self.best_metric = metric
            self.best_path = path

    def load_best(self, like_params):
        assert self.best_path is not None, "no checkpoints saved"
        tree = load_pytree(self.best_path)
        import jax.numpy as jnp

        return jax.tree.map(jnp.asarray, tree["params"])
