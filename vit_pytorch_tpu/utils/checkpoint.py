"""Checkpoint / resume via orbax (SURVEY §5: the reference has no checkpoint
system beyond ``state_dict`` round-trips; here orbax provides atomic,
sharding-aware checkpoints that restore across mesh layouts).

Two tiers:

- ``save_checkpoint`` / ``restore_checkpoint``: one-shot pytree round-trips
  (the parity workhorse — synchronous, no bookkeeping).
- ``CheckpointManager``: the training-system tier — step discovery
  (``latest_step``), keep-N retention, async save with a guaranteed
  ``wait_until_finished`` at close/exit, and latest-step restore for
  resume-mid-training.
"""

from __future__ import annotations

import atexit
import os
from typing import Any, Optional, Sequence

import jax


def _abstract(target: Any):
    import orbax.checkpoint as ocp

    return jax.tree.map(ocp.utils.to_shape_dtype_struct, target)


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
    return ckptr.restore(path, _abstract(target))


class CheckpointManager:
    """Training checkpoints with retention and resume.

    >>> mgr = CheckpointManager(dir, max_to_keep=3)
    >>> mgr.save(step, state)                 # async by default
    >>> state = mgr.restore(state)            # latest step
    >>> mgr.latest_step()                     # None when no checkpoint yet
    >>> mgr.close()                           # flush pending async saves

    Context-manager friendly (``with CheckpointManager(...) as mgr:``); an
    atexit hook also flushes pending saves so a crash between save() and
    close() never leaves a torn checkpoint visible (orbax commits
    atomically via a rename).
    """

    def __init__(
        self,
        directory: str,
        *,
        max_to_keep: Optional[int] = None,
        async_save: bool = True,
        save_interval_steps: int = 1,
    ):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            save_interval_steps=save_interval_steps,
            enable_async_checkpointing=async_save,
        )
        self._mgr = ocp.CheckpointManager(os.path.abspath(directory), options=options)
        self._closed = False
        atexit.register(self._atexit)

    # -- saving ----------------------------------------------------------
    def save(self, step: int, state: Any, *, metrics: Optional[dict] = None,
             force: bool = False) -> bool:
        """Queue an (async) save; returns True if a save was scheduled
        (False when save_interval_steps skips this step)."""
        return self._mgr.save(
            int(step),
            args=self._ocp.args.StandardSave(state),
            metrics=metrics,
            force=force,
        )

    def wait_until_finished(self):
        self._mgr.wait_until_finished()

    # -- discovery -------------------------------------------------------
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self) -> Sequence[int]:
        return sorted(self._mgr.all_steps())

    # -- restoring -------------------------------------------------------
    def restore(self, target: Any, step: Optional[int] = None) -> Any:
        """Restore into ``target``'s structure from ``step`` (default: the
        latest).  Raises FileNotFoundError when no checkpoint exists."""
        step = self.latest_step() if step is None else int(step)
        if step is None:
            raise FileNotFoundError(
                f"no checkpoint found under {self._mgr.directory}"
            )
        return self._mgr.restore(
            step, args=self._ocp.args.StandardRestore(_abstract(target))
        )

    # -- lifecycle -------------------------------------------------------
    def close(self):
        if not self._closed:
            self._mgr.wait_until_finished()
            self._mgr.close()
            self._closed = True

    def _atexit(self):
        try:
            self.close()
        except Exception:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
