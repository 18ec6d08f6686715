"""Adversarial domain-adaptation training (GAN-style, two optimizers).

Compiled equivalent of lib/core/function.py `train_da`/`train_da_ms`
(:96-258) + tools/train_da_ms.py: per step,

  1. discriminator update on *detached* generator heatmaps
     (source label 0, target-domain label 1, softmax CE);
  2. generator update: per-scale JointsMSELoss on the source half of the
     batch + BETA * adversarial term, where D_LOSS mode 1 pushes all
     domains toward the source label and mode 2 maximises discriminator
     error (1 - CE(domain_target)).

Both phases fuse into ONE jitted step with two optax states — the
reference's two backward passes become two grad computations over the
shared forward.
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


class DAState(struct.PyTreeNode):
    step: Array
    gen_params: Any
    gen_stats: Any
    disc_params: Any
    disc_stats: Any
    gen_opt: Any
    disc_opt: Any
    gen_tx: optax.GradientTransformation = struct.field(pytree_node=False)
    disc_tx: optax.GradientTransformation = struct.field(pytree_node=False)
    gen_apply: Callable = struct.field(pytree_node=False)
    disc_apply: Callable = struct.field(pytree_node=False)

    @classmethod
    def create(cls, model, model_vars, disc, disc_vars, gen_tx, disc_tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            gen_params=model_vars["params"],
            gen_stats=model_vars.get("batch_stats", FrozenDict()),
            disc_params=disc_vars["params"],
            disc_stats=disc_vars.get("batch_stats", FrozenDict()),
            gen_opt=gen_tx.init(model_vars["params"]),
            disc_opt=disc_tx.init(disc_vars["params"]),
            gen_tx=gen_tx,
            disc_tx=disc_tx,
            gen_apply=model.apply,
            disc_apply=disc.apply,
        )


def softmax_ce(logits: Array, labels: Array) -> Array:
    return jnp.mean(
        -jnp.take_along_axis(jax.nn.log_softmax(logits, -1), labels[:, None], 1)[:, 0]
    )


def make_da_train_step(
    beta: float = 0.0002,
    d_loss_mode: int = 1,
    num_source: int | None = None,
):
    """Returns step(state, batch) -> (state, metrics).

    batch: `source_image` (Ns,...), `target_image` (Nt,...) plus the four
    per-scale targets `target{,2,3,4}` / `target_weight{,2,3,4}` for the
    source half (multi-scale CMS heads).
    """

    def gen_forward(params, stats, apply_fn, images):
        outs, mutated = apply_fn(
            {"params": params, "batch_stats": stats},
            images,
            train=True,
            mutable=["batch_stats"],
        )
        return outs, mutated["batch_stats"]

    def step(state: DAState, batch):
        src, tgt = batch["source_image"], batch["target_image"]
        ns, nt = src.shape[0], tgt.shape[0]
        comb = jnp.concatenate([src, tgt], axis=0)
        domain = jnp.concatenate(
            [jnp.zeros(ns, jnp.int32), jnp.ones(nt, jnp.int32)], axis=0
        )

        # --- phase 1: discriminator on detached heatmaps ---
        outs_detached, _ = gen_forward(
            jax.lax.stop_gradient(state.gen_params), state.gen_stats, state.gen_apply, comb
        )
        outs_detached = jax.tree_util.tree_map(jax.lax.stop_gradient, outs_detached)

        def disc_loss_fn(dparams):
            logits, mutated = state.disc_apply(
                {"params": dparams, "batch_stats": state.disc_stats},
                *outs_detached,
                train=True,
                mutable=["batch_stats"],
            )
            return softmax_ce(logits, domain), mutated["batch_stats"]

        (d_loss, new_disc_stats), d_grads = jax.value_and_grad(disc_loss_fn, has_aux=True)(
            state.disc_params
        )
        d_updates, new_disc_opt = state.disc_tx.update(d_grads, state.disc_opt, state.disc_params)
        new_disc_params = optax.apply_updates(state.disc_params, d_updates)

        # --- phase 2: generator (fresh forward, frozen new discriminator) ---
        def gen_loss_fn(gparams):
            outs, new_stats = gen_forward(gparams, state.gen_stats, state.gen_apply, comb)
            hm_losses = []
            scale_keys = [("target", "target_weight"), ("target2", "target_weight2"),
                          ("target3", "target_weight3"), ("target4", "target_weight4")]
            for out, (tk, wk) in zip(outs, scale_keys):
                if tk not in batch:
                    break
                hm_losses.append(joints_mse_loss(out[:ns], batch[tk], batch[wk]))
            hm_loss = sum(hm_losses)

            logits = state.disc_apply(
                {"params": jax.lax.stop_gradient(new_disc_params),
                 "batch_stats": new_disc_stats},
                *outs,
                train=False,
            )
            if d_loss_mode == 1:
                adv = softmax_ce(logits, jnp.zeros(ns + nt, jnp.int32))
            else:
                adv = 1.0 - softmax_ce(logits, domain)
            return hm_loss + beta * adv, (new_stats, hm_loss, adv)

        (g_loss, (new_gen_stats, hm_loss, adv)), g_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True
        )(state.gen_params)
        g_updates, new_gen_opt = state.gen_tx.update(g_grads, state.gen_opt, state.gen_params)
        new_gen_params = optax.apply_updates(state.gen_params, g_updates)

        new_state = state.replace(
            step=state.step + 1,
            gen_params=new_gen_params,
            gen_stats=new_gen_stats,
            gen_opt=new_gen_opt,
            disc_params=new_disc_params,
            disc_stats=new_disc_stats,
            disc_opt=new_disc_opt,
        )
        return new_state, {
            "loss": g_loss,
            "hm_loss": hm_loss,
            "d_loss": d_loss,
            "adv_loss": adv,
        }

    return step
