"""Standard ROI heads: pooler -> box head -> FastRCNN outputs.

Equivalent of detectron2 modeling/roi_heads/: `StandardROIHeads`
(roi_heads.py:530-780), proposal sampling (:181-280),
`FastRCNNConvFCHead` (box_head.py), `FastRCNNOutputLayers`
(fast_rcnn.py:174-547) and `fast_rcnn_inference_single_image`
(fast_rcnn.py:118) — with every ragged structure padded + masked.

Supports the reference flagship's class-agnostic box regression
(object_detection_utils.py config_4: CLS_AGNOSTIC_BBOX_REG=True,
NUM_CLASSES=1, DETECTIONS_PER_IMAGE=2).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import boxes as box_ops
from ..ops import nms as nms_ops
from ..ops.roi_align import multilevel_roi_align
from .rpn import smooth_l1
from .sampling import gather_topk_mask, subsample_labels

Array = jax.Array
Dtype = Any


@dataclasses.dataclass(frozen=True)
class ROIHeadsConfig:
    num_classes: int = 1
    batch_size_per_image: int = 512
    positive_fraction: float = 0.25
    iou_threshold: float = 0.5
    pooler_resolution: int = 7
    pooler_sampling_ratio: int = 2
    fc_dim: int = 1024
    num_fc: int = 2
    cls_agnostic_bbox_reg: bool = False
    smooth_l1_beta: float = 0.0
    bbox_reg_weights: tuple[float, ...] = (10.0, 10.0, 5.0, 5.0)
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    detections_per_image: int = 100
    in_levels: tuple[str, ...] = ("p2", "p3", "p4", "p5")
    pooler_impl: str = "windowed"  # 'windowed' (MXU slices+matmuls) | 'gather'
    pooler_window: int = 48


class BoxHead(nn.Module):
    """Flatten pooled features -> N fully-connected layers (box_head.py)."""

    fc_dim: int = 1024
    num_fc: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (R, P, P, C)
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_fc):
            x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name=f"fc{i + 1}")(x))
        return x


class FastRCNNOutput(nn.Module):
    """Linear classifier (+1 background) and box regressor heads."""

    num_classes: int
    cls_agnostic: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scores = nn.Dense(
            self.num_classes + 1,
            kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype,
            name="cls_score",
        )(x)
        num_reg = 1 if self.cls_agnostic else self.num_classes
        deltas = nn.Dense(
            4 * num_reg,
            kernel_init=nn.initializers.normal(0.001),
            dtype=self.dtype,
            name="bbox_pred",
        )(x)
        return scores.astype(jnp.float32), deltas.astype(jnp.float32)


class StandardROIHeads(nn.Module):
    """Pooler + box head + output layers over a batch of images.

    Call with batched pyramid features {level: (B, H, W, C)} and batched
    boxes (B, R, 4); returns scores (B, R, C+1) and deltas (B, R, 4*reg).
    """

    config: ROIHeadsConfig = ROIHeadsConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: dict, boxes: Array, strides: dict):
        cfg = self.config
        level_feats = {l: feats[l] for l in cfg.in_levels}
        level_strides = tuple(strides[l] for l in cfg.in_levels)

        if cfg.pooler_impl == "pallas":
            from ..ops.pallas_pooler import multilevel_roi_align_pallas

            # one kernel launch per image (B is static); the assigned FPN
            # level is selected inside the kernel via conditional DMA
            pooled = jnp.stack(
                [
                    multilevel_roi_align_pallas(
                        tuple(level_feats[l][i] for l in cfg.in_levels),
                        boxes[i],
                        cfg.pooler_resolution,
                        level_strides,
                        sampling_ratio=cfg.pooler_sampling_ratio,
                        window=cfg.pooler_window,
                    )
                    for i in range(boxes.shape[0])
                ]
            )
        else:
            def pool_one(image_feats, image_boxes):
                return multilevel_roi_align(
                    [image_feats[l] for l in cfg.in_levels],
                    image_boxes,
                    cfg.pooler_resolution,
                    level_strides,
                    sampling_ratio=cfg.pooler_sampling_ratio,
                    impl=cfg.pooler_impl,
                    window=cfg.pooler_window,
                )

            pooled = jax.vmap(pool_one)(level_feats, boxes)  # (B, R, P, P, C)
        b, r = pooled.shape[0], pooled.shape[1]
        flat = pooled.reshape(b * r, *pooled.shape[2:]).astype(self.dtype)
        x = BoxHead(cfg.fc_dim, cfg.num_fc, dtype=self.dtype, name="box_head")(flat)
        scores, deltas = FastRCNNOutput(
            cfg.num_classes, cfg.cls_agnostic_bbox_reg, dtype=self.dtype, name="predictor"
        )(x)
        return scores.reshape(b, r, -1), deltas.reshape(b, r, -1)


def sample_proposals(
    proposals: Array,  # (P, 4)
    prop_valid: Array,  # (P,)
    gt_boxes: Array,  # (G, 4) padded
    gt_classes: Array,  # (G,) 0-based class ids
    gt_valid: Array,  # (G,)
    key,
    cfg: ROIHeadsConfig,
):
    """label_and_sample_proposals for one image (roi_heads.py:181-280).

    GT boxes are appended to the proposal set (add_ground_truth_to_proposals)
    so at least the GT itself is a positive. Returns a fixed-size sampled
    subset of ``batch_size_per_image`` with per-sample class targets
    (num_classes == background) and matched GT boxes.
    """
    k1, k2 = jax.random.split(key)
    boxes = jnp.concatenate([proposals, gt_boxes], axis=0)
    valid = jnp.concatenate([prop_valid, gt_valid], axis=0)

    iou = box_ops.pairwise_iou(gt_boxes, boxes) * gt_valid[:, None]
    iou = iou * valid[None, :]
    matched_idx, matched_labels = box_ops.match_to_gt(
        iou, (cfg.iou_threshold,), (0, 1), allow_low_quality=False
    )
    has_gt = jnp.any(gt_valid)
    fg = (matched_labels == 1) & valid & has_gt
    bg = (matched_labels == 0) & valid

    labels = jnp.where(fg, gt_classes[matched_idx], cfg.num_classes)
    pos_sel, neg_sel = subsample_labels(
        jnp.where(fg, 1, jnp.where(bg, 0, -1)),
        cfg.batch_size_per_image,
        cfg.positive_fraction,
        k1,
    )
    sel = pos_sel | neg_sel
    idx, sel_valid = gather_topk_mask(sel, cfg.batch_size_per_image, k2)
    return {
        "boxes": boxes[idx],
        "valid": sel_valid,
        "gt_classes": jnp.where(sel_valid, labels[idx], cfg.num_classes),
        "gt_boxes": gt_boxes[matched_idx[idx]],
        "is_fg": pos_sel[idx] & sel_valid,
    }


def fast_rcnn_losses(
    scores: Array,  # (R, C+1)
    deltas: Array,  # (R, 4*numreg)
    sampled: dict,
    cfg: ROIHeadsConfig,
) -> dict:
    """Softmax CE + smooth-L1 on foreground (fast_rcnn.py:307-420)."""
    valid = sampled["valid"]
    n_valid = jnp.maximum(jnp.sum(valid), 1.0)
    logp = jax.nn.log_softmax(scores, axis=-1)
    cls_loss = -jnp.take_along_axis(logp, sampled["gt_classes"][:, None], axis=1)[:, 0]
    loss_cls = jnp.sum(cls_loss * valid) / n_valid

    fg = sampled["is_fg"]
    gt_deltas = box_ops.get_deltas(sampled["boxes"], sampled["gt_boxes"], cfg.bbox_reg_weights)
    if cfg.cls_agnostic_bbox_reg:
        fg_deltas = deltas.reshape(-1, 4)
    else:
        d = deltas.reshape(-1, cfg.num_classes, 4)
        cls_idx = jnp.clip(sampled["gt_classes"], 0, cfg.num_classes - 1)
        fg_deltas = jnp.take_along_axis(d, cls_idx[:, None, None], axis=1)[:, 0]
    reg = jnp.sum(smooth_l1(fg_deltas, gt_deltas, cfg.smooth_l1_beta), axis=-1)
    # normalized by total sampled count (fast_rcnn.py box_reg_loss).
    loss_box = jnp.sum(reg * fg) / n_valid
    return {"loss_cls": loss_cls, "loss_box_reg": loss_box}


def fast_rcnn_inference(
    scores: Array,  # (R, C+1) logits
    deltas: Array,  # (R, 4*numreg)
    proposals: Array,  # (R, 4)
    prop_valid: Array,
    image_hw: tuple,
    cfg: ROIHeadsConfig,
) -> dict:
    """Single-image inference (fast_rcnn.py:118): score filter -> per-class
    NMS -> top-k. Fixed output size ``detections_per_image``."""
    probs = jax.nn.softmax(scores, axis=-1)[:, : cfg.num_classes]  # (R, C)
    if cfg.cls_agnostic_bbox_reg:
        boxes_per_class = jnp.broadcast_to(
            box_ops.apply_deltas(deltas.reshape(-1, 4), proposals, cfg.bbox_reg_weights)[
                :, None, :
            ],
            (proposals.shape[0], cfg.num_classes, 4),
        )
    else:
        d = deltas.reshape(-1, cfg.num_classes, 4)
        boxes_per_class = box_ops.apply_deltas(
            d, proposals[:, None, :], cfg.bbox_reg_weights
        )
    h, w = image_hw
    boxes_per_class = box_ops.clip_boxes(boxes_per_class, h, w)

    r, c = probs.shape
    flat_boxes = boxes_per_class.reshape(-1, 4)
    flat_scores = probs.reshape(-1)
    flat_cls = jnp.broadcast_to(jnp.arange(c)[None, :], (r, c)).reshape(-1)
    flat_valid = (
        (flat_scores > cfg.score_thresh)
        & jnp.repeat(prop_valid, c)
        & box_ops.nonempty_mask(flat_boxes)
    )
    keep = nms_ops.batched_nms_mask(
        flat_boxes, flat_scores, flat_cls, cfg.nms_thresh, flat_valid
    )
    masked = jnp.where(keep, flat_scores, -jnp.inf)
    k = min(cfg.detections_per_image, masked.shape[0])
    top_scores, top_idx = jax.lax.top_k(masked, k)
    return {
        "boxes": flat_boxes[top_idx],
        "scores": jnp.where(jnp.isfinite(top_scores), top_scores, 0.0),
        "classes": flat_cls[top_idx],
        "valid": jnp.isfinite(top_scores),
    }
