"""Region Proposal Network — fixed-shape XLA formulation.

Equivalent of detectron2 modeling/proposal_generator/rpn.py (head :158,
label_and_sample_anchors :366, losses :431, forward :482) and
find_top_rpn_proposals (proposal_utils.py:22). All ragged pieces of the
reference (variable #proposals, keep-lists) are padded + masked:
proposals come back as (post_nms_topk, 4) with a validity mask.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ..ops import boxes as box_ops
from ..ops import nms as nms_ops
from .sampling import subsample_labels

Array = jax.Array
Dtype = Any


@dataclasses.dataclass(frozen=True)
class RPNConfig:
    pre_nms_topk_train: int = 2000
    post_nms_topk_train: int = 1000
    pre_nms_topk_test: int = 1000
    post_nms_topk_test: int = 1000
    nms_thresh: float = 0.7
    iou_thresholds: tuple[float, float] = (0.3, 0.7)
    batch_size_per_image: int = 256
    positive_fraction: float = 0.5
    smooth_l1_beta: float = 0.0
    min_size: float = 0.0
    bbox_reg_weights: tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)


class RPNHead(nn.Module):
    """Shared 3x3 conv -> (objectness, anchor deltas) per level."""

    num_anchors: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: dict):
        out = {}
        in_ch = feats[next(iter(feats))].shape[-1]
        conv3 = nn.Conv(in_ch, (3, 3), padding=1, dtype=self.dtype, name="conv")
        obj = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype, name="objectness")
        deltas = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype, name="deltas")
        for lvl, x in feats.items():
            t = nn.relu(conv3(x))
            out[lvl] = (obj(t).astype(jnp.float32), deltas(t).astype(jnp.float32))
        return out


def smooth_l1(pred: Array, target: Array, beta: float) -> Array:
    diff = jnp.abs(pred - target)
    if beta <= 0:
        return diff
    return jnp.where(diff < beta, 0.5 * diff**2 / beta, diff - 0.5 * beta)


def rpn_losses(
    head_out: dict,
    anchors: dict,
    gt_boxes: Array,  # (G, 4) padded
    gt_valid: Array,  # (G,)
    key,
    cfg: RPNConfig = RPNConfig(),
) -> dict:
    """Single-image RPN losses (vmap over the batch outside)."""
    levels = sorted(anchors.keys())
    anchor_cat = jnp.concatenate([anchors[l] for l in levels], axis=0)
    logits = jnp.concatenate(
        [head_out[l][0].reshape(-1) for l in levels], axis=0
    )
    deltas = jnp.concatenate(
        [head_out[l][1].reshape(-1, 4) for l in levels], axis=0
    )

    iou = box_ops.pairwise_iou(gt_boxes, anchor_cat) * gt_valid[:, None]
    matched_idx, labels = box_ops.match_to_gt(
        iou, cfg.iou_thresholds, (0, -1, 1), allow_low_quality=True
    )
    # Images with no GT: everything negative (rpn.py:385-392).
    labels = jnp.where(jnp.any(gt_valid), labels, 0)

    pos_sel, neg_sel = subsample_labels(
        labels, cfg.batch_size_per_image, cfg.positive_fraction, key
    )
    sel = pos_sel | neg_sel
    normalizer = float(cfg.batch_size_per_image)

    obj_target = pos_sel.astype(jnp.float32)
    obj_loss_all = optax_sigmoid_ce(logits, obj_target)
    objectness_loss = jnp.sum(obj_loss_all * sel) / normalizer

    matched_gt = gt_boxes[matched_idx]
    gt_deltas = box_ops.get_deltas(anchor_cat, matched_gt, cfg.bbox_reg_weights)
    box_loss_all = jnp.sum(smooth_l1(deltas, gt_deltas, cfg.smooth_l1_beta), axis=-1)
    localization_loss = jnp.sum(box_loss_all * pos_sel) / normalizer

    return {"loss_rpn_cls": objectness_loss, "loss_rpn_loc": localization_loss}


def optax_sigmoid_ce(logits: Array, targets: Array) -> Array:
    # the package-wide stable BCE-with-logits (one source of truth;
    # retinanet/cascade/fcos call optax directly too)
    return optax.sigmoid_binary_cross_entropy(logits, targets)


def find_top_proposals(
    head_out: dict,
    anchors: dict,
    image_hw: tuple,
    cfg: RPNConfig,
    train: bool,
) -> tuple[Array, Array, Array]:
    """Single-image proposal selection (proposal_utils.py:22 semantics).

    Per level: top-k by objectness -> decode -> clip -> drop tiny -> NMS;
    then global top post_nms_topk over surviving candidates.

    Returns (boxes (P, 4), scores (P,), valid (P,)).
    """
    pre_k = cfg.pre_nms_topk_train if train else cfg.pre_nms_topk_test
    post_k = cfg.post_nms_topk_train if train else cfg.post_nms_topk_test
    h, w = image_hw

    all_boxes, all_scores, all_keep = [], [], []
    for lvl in sorted(anchors.keys()):
        logits, deltas = head_out[lvl]
        logits = logits.reshape(-1)
        deltas = deltas.reshape(-1, 4)
        k = min(pre_k, logits.shape[0])
        scores, idx = jax.lax.top_k(logits, k)
        boxes = box_ops.apply_deltas(deltas[idx], anchors[lvl][idx], cfg.bbox_reg_weights)
        boxes = box_ops.clip_boxes(boxes, h, w)
        valid = box_ops.nonempty_mask(boxes, cfg.min_size) & jnp.isfinite(scores)
        keep = nms_ops.nms_mask(boxes, scores, cfg.nms_thresh, valid)
        all_boxes.append(boxes)
        all_scores.append(scores)
        all_keep.append(keep)

    boxes = jnp.concatenate(all_boxes, axis=0)
    scores = jnp.concatenate(all_scores, axis=0)
    keep = jnp.concatenate(all_keep, axis=0)
    masked = jnp.where(keep, scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(masked, min(post_k, masked.shape[0]))
    return boxes[top_idx], top_scores, jnp.isfinite(top_scores)
