"""Checkpointing (SURVEY.md §2 C10, §5.3/5.4): orbax-backed save/restore of
the same logical fields the reference persists — {epoch, model state,
optimizer state, best_acc} — plus best-checkpoint copying on validation
improvement and append-mode resume.

Layout:
  <dir>/ckpt/<step>/...   orbax StandardCheckpointer pytree
  <dir>/best/...          copy of the best-so-far checkpoint
  (reference wrote checkpoint.pth.tar / model_best.pth.tar; a torch-layout
  export for cross-validation lives in posetpu.ckpt.torch_export)
"""

from __future__ import annotations

import os
import shutil

import flax.serialization
import jax
import numpy as np
import orbax.checkpoint as ocp


def _as_pytree(state, epoch, best_acc):
    """Works for any flax.struct state (TrainState, JointState, ...)."""
    return {
        "state": flax.serialization.to_state_dict(state),
        "epoch": np.asarray(epoch, np.int32),
        "best_acc": np.asarray(best_acc, np.float32),
    }


class CheckpointManager:
    """Thin orbax wrapper with the reference's `checkpoint` + `model_best`
    behavior."""

    def __init__(self, directory, max_to_keep=3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()
        self.max_to_keep = max_to_keep

    def _path(self, epoch):
        return os.path.join(self.directory, "ckpt", f"{epoch:05d}")

    @property
    def best_path(self):
        return os.path.join(self.directory, "best")

    def save(self, state, epoch, best_acc, is_best=False):
        """Async by default (SURVEY.md §5.3: orbax async checkpointing):
        the write overlaps the next epoch's training; we only block on the
        PREVIOUS in-flight save, and on the current one when it must be
        copied to best/."""
        self._ckpt.wait_until_finished()  # previous epoch's async write
        path = self._path(epoch)
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckpt.save(path, _as_pytree(state, epoch, best_acc))
        if is_best:
            self._ckpt.wait_until_finished()
            if os.path.exists(self.best_path):
                shutil.rmtree(self.best_path)
            shutil.copytree(path, self.best_path)
        self._gc(keep=os.path.basename(path))
        return path

    def wait(self):
        """Block until any in-flight async save has committed."""
        self._ckpt.wait_until_finished()

    def _finished(self, root):
        return sorted(
            n for n in os.listdir(root) if "orbax-checkpoint-tmp" not in n
        )

    def _gc(self, keep=None):
        root = os.path.join(self.directory, "ckpt")
        if not os.path.isdir(root):
            return
        for name in self._finished(root)[: -self.max_to_keep]:
            if name != keep:  # never delete an in-flight write
                shutil.rmtree(os.path.join(root, name), ignore_errors=True)

    def latest_path(self):
        root = os.path.join(self.directory, "ckpt")
        if not os.path.isdir(root):
            return None
        done = self._finished(root)
        return os.path.join(root, done[-1]) if done else None

    def restore(self, template_state, path=None):
        """Restore into the shapes/dtypes of ``template_state`` (any flax
        struct — pose TrainState or joint pose+agent state).  Returns
        (state, epoch, best_acc); mirrors the reference resume path
        (SURVEY.md §3.4)."""
        self._ckpt.wait_until_finished()  # drain any in-flight save
        path = path or self.latest_path()
        if path is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        template = _as_pytree(template_state, 0, 0.0)
        tree = self._ckpt.restore(
            path, jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        )
        state = flax.serialization.from_state_dict(template_state, tree["state"])
        return state, int(tree["epoch"]), float(tree["best_acc"])
