"""Training layer: fused steps, joint adversarial minimax, epoch driver,
CLI (SURVEY.md §2 C7/C8, §3.1/3.2)."""

from posetpu.train.state import TrainState, lr_schedule, make_optimizer
from posetpu.train.step import (
    fuse_steps,
    make_eval_step,
    make_train_step,
    stacked_mse,
)
from posetpu.train.adversarial import (
    JointState,
    apply_occlusion,
    make_joint_step,
    make_joint_step_split,
    per_sample_stacked_mse,
)

__all__ = [
    "TrainState",
    "lr_schedule",
    "make_optimizer",
    "make_eval_step",
    "fuse_steps",
    "make_train_step",
    "stacked_mse",
    "JointState",
    "apply_occlusion",
    "make_joint_step",
    "make_joint_step_split",
    "per_sample_stacked_mse",
]
