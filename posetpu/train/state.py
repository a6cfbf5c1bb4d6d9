"""Train state pytree + optimizer construction (SURVEY.md §2 C8: RMSprop
lr 2.5e-4 with manual step-decay schedule)."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def lr_schedule(optim_cfg, steps_per_epoch):
    """Step-decay schedule matching the reference's manual
    `adjust_learning_rate` (drop by gamma at each epoch in `schedule`)."""
    boundaries = {
        int(e) * steps_per_epoch: optim_cfg.gamma for e in optim_cfg.schedule
    }
    return optax.piecewise_constant_schedule(optim_cfg.lr, boundaries)


def make_optimizer(optim_cfg, steps_per_epoch=1):
    """torch-RMSprop-equivalent optax chain (alpha=0.99, eps=1e-8)."""
    sched = lr_schedule(optim_cfg, steps_per_epoch)
    tx = optax.rmsprop(
        learning_rate=sched,
        decay=optim_cfg.rms_decay,
        eps=optim_cfg.rms_eps,
        momentum=optim_cfg.momentum if optim_cfg.momentum else None,
    )
    if optim_cfg.weight_decay:
        tx = optax.chain(
            optax.add_decayed_weights(optim_cfg.weight_decay), tx
        )
    return tx
