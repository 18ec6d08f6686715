"""Jitted detector train/eval steps (detectron2 SimpleTrainer.run_step
equivalent, engine/train_loop.py:216-295, for GeneralizedRCNN/RetinaNet)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


class DetTrainState(struct.PyTreeNode):
    step: Any
    params: Any
    opt_state: Any
    loss_normalizer: Any  # RetinaNet EMA foreground count (d2 init 100)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Any = struct.field(pytree_node=False)

    @classmethod
    def create(cls, model, variables, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            opt_state=tx.init(variables["params"]),
            loss_normalizer=jnp.asarray(100.0, jnp.float32),
            tx=tx,
            apply_fn=model.apply,
        )


def make_detection_train_step(
    needs_sampling_rng: bool = True, ema_loss_normalizer: bool = False
):
    """step(state, batch, key) -> (state, metrics). batch: image +
    gt_boxes/gt_classes/gt_valid (fixed shapes).

    ema_loss_normalizer: d2 RetinaNet semantics — normalize the batch
    loss SUMS by an EMA of the foreground-anchor count (momentum 0.9)
    instead of the current batch's count. The model's reported num_fg is
    independent of params, so rescaling loss and grads post-hoc by
    (batch_norm / ema_norm) is gradient-exact.
    """

    def step(state: DetTrainState, batch, key):
        def loss_fn(params):
            kwargs = dict(
                gt_boxes=batch["gt_boxes"],
                gt_classes=batch["gt_classes"],
                gt_valid=batch["gt_valid"],
                train=True,
            )
            if needs_sampling_rng:
                losses = state.apply_fn(
                    {"params": params}, batch["image"], rngs={"sampling": key}, **kwargs
                )
            else:
                losses = state.apply_fn({"params": params}, batch["image"], **kwargs)
            return losses["loss_total"], losses

        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)

        new_normalizer = state.loss_normalizer
        if ema_loss_normalizer and "num_fg" in losses:
            # losses["num_fg"] is already max(count, 1) (the model clamps
            # — models/retinanet.py:199), so zero-foreground batches keep
            # scale > 0 and still train on background cls, matching the
            # reference's _ema_update("loss_normalizer", max(n, 1), 100)
            new_normalizer = 0.9 * state.loss_normalizer + 0.1 * losses["num_fg"]
            # loss_total was normalized by num_fg; rescale to the EMA
            scale = losses["num_fg"] / jnp.maximum(new_normalizer, 1e-6)
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
            loss = loss * scale

        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {k: v for k, v in losses.items()}
        metrics["grad_norm"] = optax.global_norm(grads)
        metrics["loss_normalizer"] = new_normalizer
        return (
            state.replace(
                step=state.step + 1, params=new_params, opt_state=new_opt,
                loss_normalizer=new_normalizer,
            ),
            metrics,
        )

    return step


def make_detection_infer_step():
    def step(state: DetTrainState, images):
        return state.apply_fn({"params": state.params}, images, train=False)

    return step
