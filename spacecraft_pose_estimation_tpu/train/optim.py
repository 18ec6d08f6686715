"""Optimizer + LR schedule builders.

Covers the reference's two solver stacks:
* HRNet `get_optimizer` (lib/utils/utils.py:58-77): adam(lr) or
  sgd(lr, momentum, wd, nesterov), with torch MultiStepLR(lr_step,
  lr_factor) stepped per-epoch (tools/train.py:144-150).
* detectron2 `build_optimizer`/`build_lr_scheduler` (solver/build.py:114,
  :253): SGD + multistep-with-warmup per-iteration, gradient clipping.
"""

from __future__ import annotations

from typing import Sequence

import optax


def multistep_schedule(
    base_lr: float,
    milestones: Sequence[int],
    factor: float = 0.1,
    warmup_steps: int = 0,
    warmup_factor: float = 1e-3,
) -> optax.Schedule:
    """MultiStep decay with optional linear warmup (detectron2 semantics)."""
    boundaries = {int(m): factor for m in milestones}
    sched = optax.piecewise_constant_schedule(base_lr, boundaries)
    if warmup_steps <= 0:
        return sched

    def with_warmup(step):
        lr = sched(step)
        alpha = optax.schedules.linear_schedule(warmup_factor, 1.0, warmup_steps)(step)
        return lr * alpha

    return with_warmup


def build_optimizer(
    name: str,
    learning_rate,
    weight_decay: float = 0.0,
    momentum: float = 0.9,
    nesterov: bool = False,
    grad_clip_norm: float | None = None,
) -> optax.GradientTransformation:
    name = name.lower()
    if name == "adam":
        tx = optax.adam(learning_rate)
    elif name == "adamw":
        tx = optax.adamw(learning_rate, weight_decay=weight_decay)
    elif name == "sgd":
        chain = []
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        chain.append(optax.sgd(learning_rate, momentum=momentum, nesterov=nesterov))
        tx = optax.chain(*chain)
    else:
        raise ValueError(f"unknown optimizer {name}")
    if grad_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
    return tx
