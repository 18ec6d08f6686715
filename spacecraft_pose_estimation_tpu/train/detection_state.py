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
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Any = struct.field(pytree_node=False)

    @classmethod
    def create(cls, model, variables, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            opt_state=tx.init(variables["params"]),
            tx=tx,
            apply_fn=model.apply,
        )


def make_detection_train_step(needs_sampling_rng: bool = True):
    """step(state, batch, key) -> (state, metrics). batch: image +
    gt_boxes/gt_classes/gt_valid (fixed shapes)."""

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
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {k: v for k, v in losses.items()}
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            state.replace(step=state.step + 1, params=new_params, opt_state=new_opt),
            metrics,
        )

    return step


def make_detection_infer_step():
    def step(state: DetTrainState, images):
        return state.apply_fn({"params": state.params}, images, train=False)

    return step
