"""Checkpoint / resume via orbax (SURVEY §5: the reference has no checkpoint
system beyond ``state_dict`` round-trips; here orbax provides atomic,
sharding-aware checkpoints that restore across mesh layouts)."""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save_checkpoint(path: str, state: Any, step: Optional[int] = None):
    """Save a pytree (e.g. TrainState) atomically."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if step is not None:
        path = os.path.join(path, str(step))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, target: Any, step: Optional[int] = None):
    """Restore into the structure of ``target`` (shapes/shardings from the
    abstract target — works under a mesh)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if step is not None:
        path = os.path.join(path, str(step))
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
    return ckptr.restore(path, abstract)
