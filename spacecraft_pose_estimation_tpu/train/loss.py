"""Heatmap regression losses.

Equivalents of ``lib/core/loss.py``:

* `joints_mse_loss` — JointsMSELoss (loss.py:15-39): per-joint
  0.5 * MSE between (optionally target-weighted) predicted and target
  heatmaps, averaged over batch and pixels, then averaged over joints.
* `joints_ohkm_mse_loss` — JointsOHKMMSELoss (loss.py:42-84): per-joint
  0.5 * MSE kept separately, then online hard-keypoint mining keeps the
  top-k joints per sample.

Heatmaps here are channels-last (B, H, W, J); target_weight is (B, J).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def joints_mse_loss(
    pred: Array, target: Array, target_weight: Array | None = None
) -> Array:
    """0.5 * target-weighted MSE, mean over (batch, pixels), mean over joints."""
    diff = _weighted_diff(pred, target, target_weight)
    # torch MSELoss(reduction='mean') over (B, H*W) per joint.
    per_joint = 0.5 * jnp.mean(diff**2, axis=(0, 1, 2))
    return jnp.mean(per_joint)


def joints_ohkm_mse_loss(
    pred: Array,
    target: Array,
    target_weight: Array | None = None,
    topk: int = 8,
) -> Array:
    """Online hard keypoint mining: keep top-k per-joint losses per sample."""
    diff = _weighted_diff(pred, target, target_weight)
    per_sample_joint = 0.5 * jnp.mean(diff**2, axis=(1, 2))  # (B, J)
    k = min(topk, per_sample_joint.shape[-1])
    top_vals, _ = jax.lax.top_k(per_sample_joint, k)
    # Reference divides the summed top-k by topk per sample, then means.
    return jnp.mean(jnp.sum(top_vals, axis=-1) / k)


def _weighted_diff(pred, target, target_weight):
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if target_weight is not None:
        w = target_weight[:, None, None, :]
        pred = pred * w
        target = target * w
    return pred - target
