"""Orbax checkpoint save/restore (the TPU-native replacement for
``torch.save``/``restart_from_checkpoint``, SURVEY.md §3.5/§5).

Writes are gated on process 0 implicitly by Orbax's multihost coordination;
the manager keeps periodic snapshots (``saveckp_freq``-style) plus a rolling
'latest', matching the reference's ``checkpoint.pth`` + ``checkpoint{epoch}``
scheme (train.py:197-211).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def save_pytree(path: str, tree: Any) -> None:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def restore_pytree(path: str, template: Optional[Any] = None) -> Any:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        shapes = jax.tree.map(ocp.utils.to_shape_dtype_struct, template) \
            if hasattr(ocp.utils, "to_shape_dtype_struct") else template
        return ckptr.restore(path, shapes)
    return ckptr.restore(path)


class CheckpointManager:
    """Step-indexed checkpoint manager with max-to-keep + periodic keeps."""

    def __init__(self, directory: str, max_to_keep: int = 3,
                 keep_period: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, keep_period=keep_period, create=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, tree: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(tree))

    def restore(self, step: Optional[int] = None, template: Optional[Any] = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
