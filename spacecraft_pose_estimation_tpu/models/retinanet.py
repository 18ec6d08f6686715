"""RetinaNet: single-stage detector with focal loss.

Equivalent of detectron2 modeling/meta_arch/retinanet.py (439 LoC over
DenseDetector) as used by the reference's config_20 preset
(object_detection_utils.py:134-161, RetinaNet R101). Levels p3..p7,
3 octave scales x 3 aspect ratios per level, 4-conv cls/box towers,
sigmoid focal loss, per-level topk -> NMS inference.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ..ops import boxes as box_ops
from ..ops import nms as nms_ops
from .anchors import fpn_anchors
from .fpn import FPN
from .resnet_backbone import RESNET_TINY, ResNetBackbone, ResNetConfig
from .rpn import smooth_l1

Array = jax.Array
Dtype = Any

RETINA_STRIDES = {"p3": 8, "p4": 16, "p5": 32, "p6": 64, "p7": 128}


def octave_sizes(base: float) -> tuple[float, ...]:
    return tuple(base * 2 ** (k / 3) for k in range(3))


@dataclasses.dataclass(frozen=True)
class RetinaNetConfig:
    backbone: ResNetConfig = ResNetConfig(depth=101)
    fpn_channels: int = 256
    num_classes: int = 1
    num_convs: int = 4
    aspect_ratios: tuple[float, ...] = (0.5, 1.0, 2.0)
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    smooth_l1_beta: float = 0.1
    iou_thresholds: tuple[float, float] = (0.4, 0.5)
    bbox_reg_weights: tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    topk_candidates: int = 1000
    detections_per_image: int = 100
    prior_prob: float = 0.01


RETINANET_TINY = RetinaNetConfig(
    backbone=RESNET_TINY, fpn_channels=16, num_convs=1, topk_candidates=64,
    detections_per_image=4,
)


class RetinaNetHead(nn.Module):
    """Shared 4-conv towers -> per-anchor class logits and box deltas."""

    num_classes: int
    num_anchors: int
    num_convs: int
    prior_prob: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: dict):
        ch = feats[next(iter(feats))].shape[-1]
        cls_tower = [
            nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name=f"cls_conv{i}")
            for i in range(self.num_convs)
        ]
        box_tower = [
            nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name=f"box_conv{i}")
            for i in range(self.num_convs)
        ]
        bias_init = nn.initializers.constant(-math.log((1 - self.prior_prob) / self.prior_prob))
        cls_out = nn.Conv(
            self.num_anchors * self.num_classes, (3, 3), padding=1,
            bias_init=bias_init, dtype=self.dtype, name="cls_score",
        )
        box_out = nn.Conv(
            self.num_anchors * 4, (3, 3), padding=1, dtype=self.dtype, name="bbox_pred"
        )
        out = {}
        for lvl, x in feats.items():
            c = x
            for conv in cls_tower:
                c = nn.relu(conv(c))
            b = x
            for conv in box_tower:
                b = nn.relu(conv(b))
            out[lvl] = (
                cls_out(c).astype(jnp.float32),
                box_out(b).astype(jnp.float32),
            )
        return out


def sigmoid_focal_loss(logits: Array, targets: Array, alpha: float, gamma: float) -> Array:
    p = jax.nn.sigmoid(logits)
    ce = optax.sigmoid_binary_cross_entropy(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        loss = loss * (alpha * targets + (1 - alpha) * (1 - targets))
    return loss


class RetinaNet(nn.Module):
    config: RetinaNetConfig = RetinaNetConfig()
    dtype: Dtype = jnp.float32
    pixel_mean: tuple = (103.530, 116.280, 123.675)
    pixel_std: tuple = (1.0, 1.0, 1.0)

    @nn.compact
    def __call__(
        self,
        images: Array,
        gt_boxes: Array | None = None,
        gt_classes: Array | None = None,
        gt_valid: Array | None = None,
        train: bool = False,
    ):
        cfg = self.config
        b, h, w = images.shape[0], images.shape[1], images.shape[2]
        x = (images.astype(jnp.float32) - jnp.asarray(self.pixel_mean)) / jnp.asarray(
            self.pixel_std
        )
        feats = ResNetBackbone(cfg.backbone, dtype=self.dtype, name="backbone")(x)
        # d2 retinanet backbone: in_features res3-res5 (no stride-4 p2
        # level), learned p6/p7 instead of the maxpool top block
        pyr = FPN(
            cfg.fpn_channels, in_levels=("res3", "res4", "res5"),
            last_level_max_pool=False, dtype=self.dtype, name="fpn",
        )(feats)
        # LastLevelP6P7 semantics (d2 build_retinanet_resnet_fpn_backbone):
        # p6 and p7 are LEARNED stride-2 convs rooted at res5 (not the
        # Faster-RCNN maxpool p6): p6 = conv(res5), p7 = conv(relu(p6)).
        p6 = nn.Conv(
            cfg.fpn_channels, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype, name="p6"
        )(feats["res5"].astype(self.dtype))
        p7 = nn.Conv(
            cfg.fpn_channels, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype, name="p7"
        )(nn.relu(p6))
        pyramid = {"p3": pyr["p3"], "p4": pyr["p4"], "p5": pyr["p5"], "p6": p6, "p7": p7}

        levels = sorted(pyramid.keys())
        shapes = {l: (pyramid[l].shape[1], pyramid[l].shape[2]) for l in levels}
        sizes = {
            l: octave_sizes(4 * RETINA_STRIDES[l]) for l in levels
        }  # ANCHOR_GENERATOR.SIZES retinanet default: 32..512 with octaves
        anchors = fpn_anchors(shapes, RETINA_STRIDES, sizes, cfg.aspect_ratios)
        anchor_cat = jnp.concatenate([anchors[l] for l in levels], axis=0)

        num_anchors = 3 * len(cfg.aspect_ratios)
        head = RetinaNetHead(
            cfg.num_classes, num_anchors, cfg.num_convs, cfg.prior_prob,
            dtype=self.dtype, name="head",
        )(pyramid)

        logits_cat = jnp.concatenate(
            [head[l][0].reshape(b, -1, cfg.num_classes) for l in levels], axis=1
        )
        deltas_cat = jnp.concatenate(
            [head[l][1].reshape(b, -1, 4) for l in levels], axis=1
        )

        if train:
            def one(logits, deltas, gb, gc, gv):
                iou = box_ops.pairwise_iou(gb, anchor_cat) * gv[:, None]
                midx, mlab = box_ops.match_to_gt(
                    iou, cfg.iou_thresholds, (0, -1, 1), allow_low_quality=True
                )
                mlab = jnp.where(jnp.any(gv), mlab, 0)
                fg = mlab == 1
                valid = mlab >= 0
                cls_t = jax.nn.one_hot(gc[midx], cfg.num_classes) * fg[:, None]
                cls_loss = sigmoid_focal_loss(
                    logits, cls_t, cfg.focal_alpha, cfg.focal_gamma
                )
                cls_loss = jnp.sum(cls_loss * valid[:, None])
                gt_d = box_ops.get_deltas(anchor_cat, gb[midx], cfg.bbox_reg_weights)
                reg = jnp.sum(smooth_l1(deltas, gt_d, cfg.smooth_l1_beta), axis=-1)
                reg_loss = jnp.sum(reg * fg)
                return cls_loss, reg_loss, jnp.sum(fg)

            cls_l, reg_l, nfg = jax.vmap(one)(
                logits_cat, deltas_cat, gt_boxes, gt_classes, gt_valid
            )
            # d2 RetinaNet normalizes SUMMED batch losses by an EMA of the
            # batch foreground count (retinanet.py loss_normalizer,
            # momentum 0.9, init 100). The EMA state lives in the train
            # step (train/detection_state.py, ema_loss_normalizer=True):
            # since num_fg does not depend on params, rescaling there is
            # gradient-exact. Here we expose the raw sums + num_fg, and
            # normalize loss_total by the current-batch count as the
            # stateless fallback.
            num_fg = jnp.maximum(jnp.sum(nfg).astype(jnp.float32), 1.0)
            losses = {
                "loss_cls_sum": jnp.sum(cls_l),
                "loss_box_reg_sum": jnp.sum(reg_l),
                "num_fg": num_fg,
                "loss_cls": jnp.sum(cls_l) / num_fg,
                "loss_box_reg": jnp.sum(reg_l) / num_fg,
            }
            losses["loss_total"] = losses["loss_cls"] + losses["loss_box_reg"]
            return losses

        # d2 dense_detector._decode_multi_level_predictions: candidate
        # selection is PER LEVEL — each level keeps its own
        # topk_candidates budget (then all levels' survivors compete in
        # one NMS), so a busy fine level cannot evict coarse-level
        # detections before NMS.
        cand_s, cand_b, cand_c = [], [], []
        for l in levels:
            lg = head[l][0].reshape(b, -1, cfg.num_classes)
            dl = head[l][1].reshape(b, -1, 4)
            anc_l = anchors[l]
            flat = jax.nn.sigmoid(lg).reshape(b, -1)
            k_l = min(cfg.topk_candidates, flat.shape[1])
            top, idx = jax.lax.top_k(flat, k_l)
            a_idx = idx // cfg.num_classes
            c_idx = idx % cfg.num_classes

            def decode(d, ai):
                return box_ops.apply_deltas(
                    d[ai], anc_l[ai], cfg.bbox_reg_weights
                )

            cand_b.append(jax.vmap(decode)(dl, a_idx))
            cand_s.append(top)
            cand_c.append(c_idx)
        s_all = jnp.concatenate(cand_s, axis=1)
        b_all = jnp.concatenate(cand_b, axis=1)
        c_all = jnp.concatenate(cand_c, axis=1)

        def infer_one(bx, sc, cl):
            bx = box_ops.clip_boxes(bx, h, w)
            valid = sc > cfg.score_thresh
            keep = nms_ops.batched_nms_mask(bx, sc, cl, cfg.nms_thresh, valid)
            masked = jnp.where(keep, sc, -jnp.inf)
            kk = min(cfg.detections_per_image, masked.shape[0])
            fs, fi = jax.lax.top_k(masked, kk)
            return {
                "boxes": bx[fi],
                "scores": jnp.where(jnp.isfinite(fs), fs, 0.0),
                "classes": cl[fi],
                "valid": jnp.isfinite(fs),
            }

        return jax.vmap(infer_one)(b_all, s_all, c_all)
