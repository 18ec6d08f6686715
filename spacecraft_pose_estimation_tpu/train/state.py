"""Train state + jittable train/eval steps for the landmark stage.

The compiled replacement for the reference's epoch loop body
(lib/core/function.py:27-94 `train`): one step = forward (train-mode BN)
-> JointsMSELoss -> grads -> optax update. Under a (data, model) mesh the
same step function is the multi-chip path: batches arrive sharded over
`data`, XLA inserts the gradient psum.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from .loss import joints_mse_loss

Array = jax.Array


class TrainState(struct.PyTreeNode):
    step: Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    @classmethod
    def create(cls, model, variables, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", FrozenDict()),
            opt_state=tx.init(variables["params"]),
            tx=tx,
            apply_fn=model.apply,
        )


def make_train_step(use_target_weight: bool = True):
    """Returns step(state, batch) -> (state, metrics).

    batch: dict with `image` (B,H,W,3), `target` (B,Hh,Wh,J),
    `target_weight` (B,J).
    """

    def loss_fn(params, state, batch):
        outputs, mutated = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            batch["image"],
            train=True,
            mutable=["batch_stats"],
        )
        tw = batch["target_weight"] if use_target_weight else None
        if isinstance(outputs, (tuple, list)):
            # multi-output heads (CMS training mode): the reference sums
            # the criterion over ALL outputs against the same target
            # (function.py:48-52) — deep supervision on every scale head
            loss = sum(
                joints_mse_loss(o, batch["target"], tw) for o in outputs
            )
        else:
            loss = joints_mse_loss(outputs, batch["target"], tw)
        hm = outputs[-1] if isinstance(outputs, (tuple, list)) else outputs
        return loss, (mutated["batch_stats"], hm)

    def step(state: TrainState, batch) -> tuple[TrainState, dict]:
        (loss, (new_stats, hm)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state, batch
        )
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        gnorm = optax.global_norm(grads)
        # training-time PCK@0.5 (the reference train loop's `acc`,
        # lib/core/function.py:66-69) — the live did-it-learn signal
        from .accuracy import pck_accuracy

        _, acc = pck_accuracy(
            jax.lax.stop_gradient(hm).astype(jnp.float32),
            batch["target"].astype(jnp.float32),
        )
        return new_state, {"loss": loss, "grad_norm": gnorm, "acc": acc}

    return step


def make_eval_step():
    """Returns eval(state, images) -> heatmaps (running-average BN)."""

    def step(state: TrainState, images: Array) -> Array:
        return state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            images,
            train=False,
        )

    return step
