"""Ensemble evaluation: heatmap averaging over k model snapshots.

Equivalent of `validate_cv` / tools/test_cv_ensemble.py (function.py:
500-536): up to 6 trained HRNets' heatmaps are averaged before decoding.
TPU-native formulation: stack the k parameter pytrees on a leading axis
and vmap one apply over it — embarrassingly parallel on the MXU, one
compiled graph regardless of k.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp


def stack_variables(variables_list: Sequence[Any]) -> Any:
    """[vars_1..vars_k] -> one pytree with a leading k axis per leaf."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *variables_list)


def make_ensemble_apply(model):
    """Returns fn(stacked_variables, images) -> mean heatmaps (B,H,W,J)."""

    def apply_one(variables, images):
        return model.apply(variables, images, train=False)

    def run(stacked_variables, images):
        heatmaps = jax.vmap(apply_one, in_axes=(0, None))(stacked_variables, images)
        return jnp.mean(heatmaps, axis=0)

    return run
