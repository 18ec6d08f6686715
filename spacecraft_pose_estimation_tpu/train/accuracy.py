"""Training-time PCK accuracy (lib/core/evaluate.py:16-71 semantics).

Compares predicted vs ground-truth heatmap argmax positions, normalised
by heatmap_size/10; a joint is correct when the normalised distance is
below ``thr`` (0.5). Joints with no GT peak (target weight 0 -> argmax at
zero map) are excluded via the -1 distance convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.heatmap import get_max_preds

Array = jax.Array


def pck_accuracy(
    pred_heatmaps: Array,  # (B, H, W, J)
    target_heatmaps: Array,  # (B, H, W, J)
    thr: float = 0.5,
) -> tuple[Array, Array]:
    """Returns (per_joint_acc (J,), mean_acc). -1 marks joints w/o GT."""
    b, h, w, j = pred_heatmaps.shape
    pred, _ = get_max_preds(pred_heatmaps)
    target, _ = get_max_preds(target_heatmaps)
    norm = jnp.asarray([w, h], jnp.float32) / 10.0
    dist = jnp.linalg.norm((pred - target) / norm, axis=-1)  # (B, J)
    has_gt = (target[..., 0] > 1) & (target[..., 1] > 1)

    correct = (dist < thr) & has_gt
    count = jnp.sum(has_gt, axis=0)
    acc = jnp.where(count > 0, jnp.sum(correct, axis=0) / jnp.maximum(count, 1), -1.0)
    valid = acc >= 0
    mean = jnp.sum(jnp.where(valid, acc, 0.0)) / jnp.maximum(jnp.sum(valid), 1)
    return acc, mean
