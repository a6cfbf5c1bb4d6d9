"""Parallelism layer (SURVEY.md §2 parallelism inventory, §5.8): shard_map
data parallelism over a jax device mesh with ICI collectives — the TPU-native
replacement for the reference's single-process nn.DataParallel (C14)."""

from posetpu.parallel.dp import (
    DATA_AXIS,
    make_batch_placer,
    make_mesh,
    shard_eval_step,
    shard_fused_train_step,
    shard_train_step,
)

__all__ = ["DATA_AXIS", "make_batch_placer", "make_mesh", "shard_eval_step", "shard_fused_train_step", "shard_train_step"]
