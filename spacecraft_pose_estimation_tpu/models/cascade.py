"""Cascade R-CNN ROI heads + mask/keypoint heads (detectron2 parity).

Compact fixed-shape equivalents of detectron2's remaining ROI-head
family (modeling/roi_heads/cascade_rcnn.py, mask_head.py,
keypoint_head.py). The spacecraft pipeline itself uses the standard box
head; these widen meta-architecture coverage for detectron2-style
workloads on TPU.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ..ops import boxes as box_ops
from ..ops.roi_align import multilevel_roi_align
from .roi_heads import BoxHead, FastRCNNOutput, ROIHeadsConfig

Array = jax.Array
Dtype = Any


@dataclasses.dataclass(frozen=True)
class CascadeConfig:
    base: ROIHeadsConfig = ROIHeadsConfig(cls_agnostic_bbox_reg=True)
    stage_ious: tuple[float, ...] = (0.5, 0.6, 0.7)
    stage_weights: tuple[tuple[float, ...], ...] = (
        (10.0, 10.0, 5.0, 5.0),
        (20.0, 20.0, 10.0, 10.0),
        (30.0, 30.0, 15.0, 15.0),
    )


class CascadeROIHeads(nn.Module):
    """Three refinement stages; inference averages stage class scores and
    keeps the final stage's boxes (cascade_rcnn.py semantics)."""

    config: CascadeConfig = CascadeConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: dict, boxes: Array, strides: dict, image_hw: tuple):
        cfg = self.config.base
        h, w = image_hw
        level_strides = tuple(strides[l] for l in cfg.in_levels)
        all_scores = []
        cur = boxes  # (B, R, 4)
        for s, stage_w in enumerate(self.config.stage_weights):
            def pool_one(image_feats, image_boxes):
                return multilevel_roi_align(
                    [image_feats[l] for l in cfg.in_levels],
                    image_boxes,
                    cfg.pooler_resolution,
                    level_strides,
                    sampling_ratio=cfg.pooler_sampling_ratio,
                )

            pooled = jax.vmap(pool_one)({l: feats[l] for l in cfg.in_levels}, cur)
            b, r = pooled.shape[:2]
            flat = pooled.reshape(b * r, *pooled.shape[2:]).astype(self.dtype)
            x = BoxHead(cfg.fc_dim, cfg.num_fc, dtype=self.dtype, name=f"box_head{s}")(flat)
            scores, deltas = FastRCNNOutput(
                cfg.num_classes, True, dtype=self.dtype, name=f"predictor{s}"
            )(x)
            scores = scores.reshape(b, r, -1)
            deltas = deltas.reshape(b, r, 4)
            all_scores.append(jax.nn.softmax(scores, axis=-1))
            cur = box_ops.clip_boxes(box_ops.apply_deltas(deltas, cur, stage_w), h, w)
            cur = jax.lax.stop_gradient(cur) if s < len(self.config.stage_weights) - 1 else cur
        mean_scores = jnp.mean(jnp.stack(all_scores), axis=0)
        return mean_scores, cur


class MaskHead(nn.Module):
    """MaskRCNNConvUpsampleHead: 4 convs -> deconv x2 -> 1x1 per-class
    mask logits (mask_head.py)."""

    num_classes: int = 1
    conv_dim: int = 256
    num_convs: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pooled: Array):  # (R, P, P, C)
        x = pooled.astype(self.dtype)
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.conv_dim, (3, 3), padding=1, dtype=self.dtype,
                                name=f"mask_fcn{i + 1}")(x))
        x = nn.relu(
            nn.ConvTranspose(self.conv_dim, (2, 2), strides=(2, 2), dtype=self.dtype,
                             name="deconv")(x)
        )
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="predictor")(
            x
        ).astype(jnp.float32)


def mask_loss(mask_logits: Array, gt_masks: Array, gt_classes: Array, fg: Array) -> Array:
    """Per-ROI BCE on the GT class's mask channel (mask_head.py loss)."""
    r = mask_logits.shape[0]
    cls = jnp.clip(gt_classes, 0, mask_logits.shape[-1] - 1)
    logits = jnp.take_along_axis(mask_logits, cls[:, None, None, None], axis=-1)[..., 0]
    ce = optax.sigmoid_binary_cross_entropy(logits, gt_masks)
    per_roi = jnp.mean(ce, axis=(1, 2))
    return jnp.sum(per_roi * fg) / jnp.maximum(jnp.sum(fg), 1.0)


class KeypointHead(nn.Module):
    """KRCNNConvDeconvUpsampleHead: 8 convs -> deconv -> x2 bilinear ->
    per-keypoint heatmap logits (keypoint_head.py)."""

    num_keypoints: int = 17
    conv_dim: int = 512
    num_convs: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pooled: Array):  # (R, P, P, C)
        from .layers import upsample_bilinear

        x = pooled.astype(self.dtype)
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.conv_dim, (3, 3), padding=1, dtype=self.dtype,
                                name=f"conv_fcn{i + 1}")(x))
        x = nn.ConvTranspose(
            self.num_keypoints, (4, 4), strides=(2, 2), dtype=self.dtype, name="score_lowres"
        )(x)
        return upsample_bilinear(x.astype(jnp.float32), 2)


def keypoint_loss(kp_logits: Array, gt_heatmap_idx: Array, kp_valid: Array, fg: Array) -> Array:
    """Softmax CE over flattened per-keypoint heatmaps
    (keypoint_head.py keypoint_rcnn_loss)."""
    r, hh, ww, k = kp_logits.shape
    flat = kp_logits.reshape(r, hh * ww, k).transpose(0, 2, 1)  # (R, K, HW)
    logp = jax.nn.log_softmax(flat, axis=-1)
    picked = jnp.take_along_axis(logp, gt_heatmap_idx[:, :, None], axis=-1)[..., 0]
    weights = kp_valid * fg[:, None]
    return -jnp.sum(picked * weights) / jnp.maximum(jnp.sum(weights), 1.0)


def keypoints_from_logits(kp_logits: Array, boxes: Array) -> Array:
    """Per-ROI keypoint heatmap logits -> image-space keypoints
    (keypoint_head.py heatmaps_to_keypoints semantics: argmax bin center
    scaled into the box, softmax prob as the score).

    Args:
      kp_logits: (R, S, S, K) logits.
      boxes: (R, 4) XYXY image-space boxes.

    Returns (R, K, 3): x, y, probability.
    """
    r, hh, ww, k = kp_logits.shape
    flat = kp_logits.reshape(r, hh * ww, k)
    idx = jnp.argmax(flat, axis=1)  # (R, K)
    prob = jax.nn.softmax(flat, axis=1)
    score = jnp.take_along_axis(prob, idx[:, None, :], axis=1)[:, 0, :]
    yi = (idx // ww).astype(jnp.float32)
    xi = (idx % ww).astype(jnp.float32)
    x0, y0 = boxes[:, 0:1], boxes[:, 1:2]
    bw = jnp.maximum(boxes[:, 2:3] - boxes[:, 0:1], 1e-6)
    bh = jnp.maximum(boxes[:, 3:4] - boxes[:, 1:2], 1e-6)
    # d2 maps heatmap bin centers with the roi_map offset convention:
    # x = x0 + (xi + 0.5) * w / S
    x = x0 + (xi + 0.5) * bw / ww
    y = y0 + (yi + 0.5) * bh / hh
    return jnp.stack([x, y, score], axis=-1)
