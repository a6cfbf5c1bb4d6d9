"""Checkpoint layer (SURVEY.md §2 C10): orbax state persistence + torch-
layout export for reference cross-validation."""

from posetpu.ckpt.orbax_io import CheckpointManager
from posetpu.ckpt.torch_export import (
    from_torch_state_dict,
    load_torch_checkpoint,
    save_torch_checkpoint,
    to_torch_state_dict,
)

__all__ = [
    "CheckpointManager",
    "from_torch_state_dict",
    "load_torch_checkpoint",
    "save_torch_checkpoint",
    "to_torch_state_dict",
]
