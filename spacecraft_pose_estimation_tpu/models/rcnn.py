"""GeneralizedRCNN: backbone -> FPN -> RPN -> ROI heads, one jitted graph.

Equivalent of detectron2 modeling/meta_arch/rcnn.py:25-224
(`preprocess_image` normalization + padding, `forward` training losses,
`inference` detections) — but batched fixed-shape end to end: images
arrive pre-sized (the dataloader letterboxes to a static size, replacing
ImageList.from_tensors), detections leave as padded arrays with masks.

The flagship preset mirrors object_detection_utils.py config_4
(X101-FPN, class-agnostic boxes, 1 class, 2 detections/image).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .anchors import fpn_anchors
from .fpn import FPN, FPN_STRIDES
from .resnet_backbone import (
    RESNET_TINY,
    RESNET50_FPN,
    RESNET101_FPN,
    RESNEXT101_32x8d,
    ResNetBackbone,
    ResNetConfig,
)
from .roi_heads import (
    ROIHeadsConfig,
    StandardROIHeads,
    fast_rcnn_inference,
    fast_rcnn_losses,
    sample_proposals,
)
from .rpn import RPNConfig, RPNHead, find_top_proposals, rpn_losses

Array = jax.Array
Dtype = Any

# Caffe2 zoo pixel stats (detectron2 configs: BGR mean, std 1).
PIXEL_MEAN = (103.530, 116.280, 123.675)
PIXEL_STD = (1.0, 1.0, 1.0)
# The X101-32x8d trunk is a TORCH-trained model (STRIDE_IN_1X1: False);
# its config overrides PIXEL_STD per channel
# (configs/COCO-Detection/faster_rcnn_X_101_32x8d_FPN_3x.yaml:5) —
# normalizing with std 1 would feed activations ~57x too large.
X101_PIXEL_STD = (57.375, 57.120, 58.395)


@dataclasses.dataclass(frozen=True)
class RCNNConfig:
    backbone: ResNetConfig = RESNEXT101_32x8d
    fpn_channels: int = 256
    anchor_sizes: tuple[tuple[float, ...], ...] = ((32,), (64,), (128,), (256,), (512,))
    anchor_aspect_ratios: tuple[float, ...] = (0.5, 1.0, 2.0)
    rpn: RPNConfig = RPNConfig()
    roi: ROIHeadsConfig = ROIHeadsConfig()
    pixel_mean: tuple[float, float, float] = PIXEL_MEAN
    pixel_std: tuple[float, float, float] = PIXEL_STD
    # Mask/Keypoint R-CNN extensions (roi_heads mask_head/keypoint_head)
    with_mask: bool = False
    with_keypoints: bool = False
    num_keypoints: int = 17
    mask_resolution: int = 14  # pooler res; head output is 2x


# The reference's detector preset: config_4 semantics. Uses the Pallas
# DMA pooler (10x faster than the XLA windowed pooler on v5e).
FASTER_RCNN_X101_SPACECRAFT = RCNNConfig(
    backbone=RESNEXT101_32x8d,
    roi=ROIHeadsConfig(
        num_classes=1, cls_agnostic_bbox_reg=True, detections_per_image=2,
        pooler_impl="pallas",
    ),
    pixel_std=X101_PIXEL_STD,
)

# Serving variant: same weights/topology, tighter proposal budgets. The
# d2 test-time defaults (1000 pre/post-NMS proposals per level) are sized
# for 100-object COCO scenes; single-spacecraft frames lose nothing at
# 512/256 while the NMS loop and ROI pooling shrink 2-4x (the two
# dominate the non-backbone time: +28/+35 ms of the 98 ms b8 graph).
FASTER_RCNN_X101_SERVING = dataclasses.replace(
    FASTER_RCNN_X101_SPACECRAFT,
    rpn=RPNConfig(pre_nms_topk_test=512, post_nms_topk_test=256),
)

# config_2 semantics (R101-FPN, object_detection_utils.py:46-62) with the
# same spacecraft ROI heads. The serving variant exists because R101's
# DENSE convs quantize well on TPU (int8 ~2x bf16), where X101's grouped
# convs do not — this is the fast detect-every-frame preset.
FASTER_RCNN_R101_SPACECRAFT = dataclasses.replace(
    FASTER_RCNN_X101_SPACECRAFT, backbone=RESNET101_FPN,
    pixel_std=PIXEL_STD,  # R101 is a true caffe2 model (std 1)
)
FASTER_RCNN_R101_SERVING = dataclasses.replace(
    FASTER_RCNN_R101_SPACECRAFT,
    rpn=RPNConfig(pre_nms_topk_test=512, post_nms_topk_test=256),
)

# Single-object serving point: the pipeline keeps only the argmax-score
# box (reference TEST.DETECTIONS_PER_IMAGE=2 + the exporter's argmax,
# export_object_detection_bounding_boxes.py:303-322), so RPN recall for
# ONE spacecraft is saturated far below COCO-sized proposal budgets;
# 256/64 cuts the NMS candidate set and the ROI head 4x again over the
# serving preset. Accuracy bound: the argmax box is invariant to the
# budget cut on single-object scenes
# (tests/test_rcnn.py::test_top1_box_invariant_to_proposal_budget).
FASTER_RCNN_R101_SERVING_1OBJ = dataclasses.replace(
    FASTER_RCNN_R101_SPACECRAFT,
    rpn=RPNConfig(pre_nms_topk_test=256, post_nms_topk_test=64),
)

RCNN_TINY = RCNNConfig(
    backbone=RESNET_TINY,
    fpn_channels=16,
    rpn=RPNConfig(
        pre_nms_topk_train=64, post_nms_topk_train=32,
        pre_nms_topk_test=64, post_nms_topk_test=32,
        batch_size_per_image=16,
    ),
    roi=ROIHeadsConfig(
        num_classes=1, cls_agnostic_bbox_reg=True, batch_size_per_image=16,
        fc_dim=32, detections_per_image=2,
    ),
)


class GeneralizedRCNN(nn.Module):
    config: RCNNConfig = FASTER_RCNN_X101_SPACECRAFT
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        images: Array,  # (B, H, W, 3) raw 0-255
        gt_boxes: Array | None = None,  # (B, G, 4) XYXY padded
        gt_classes: Array | None = None,  # (B, G) 0-based ids
        gt_valid: Array | None = None,  # (B, G) bool
        gt_masks: Array | None = None,  # (B, G, H, W) bool (with_mask)
        gt_keypoints: Array | None = None,  # (B, G, K, 3) x,y,vis (with_keypoints)
        rng: Array | None = None,
        train: bool = False,
        precomputed_feats: dict | None = None,  # res2..res5 (serving: e.g.
        # the int8 PTQ backbone, models/backbone_int8.py, feeds these)
    ):
        cfg = self.config
        b, h, w = images.shape[0], images.shape[1], images.shape[2]

        mean = jnp.asarray(cfg.pixel_mean, jnp.float32)
        std = jnp.asarray(cfg.pixel_std, jnp.float32)
        x = (images.astype(jnp.float32) - mean) / std

        if precomputed_feats is None:
            feats = ResNetBackbone(cfg.backbone, dtype=self.dtype, name="backbone")(x)
        else:
            # params of the unused backbone still exist in the tree; the
            # serving caller replaces its compute with a quantized one
            feats = precomputed_feats
        pyramid = FPN(cfg.fpn_channels, dtype=self.dtype, name="fpn")(feats)

        levels = sorted(pyramid.keys())
        shapes = {l: (pyramid[l].shape[1], pyramid[l].shape[2]) for l in levels}
        sizes = {l: cfg.anchor_sizes[i] for i, l in enumerate(levels)}
        anchors = fpn_anchors(shapes, FPN_STRIDES, sizes, cfg.anchor_aspect_ratios)

        num_anchors = len(cfg.anchor_aspect_ratios) * len(cfg.anchor_sizes[0])
        head_out = RPNHead(num_anchors, dtype=self.dtype, name="rpn_head")(pyramid)

        # Per-image proposal selection, vmapped over the batch.
        def proposals_one(img_head_out):
            return find_top_proposals(img_head_out, anchors, (h, w), cfg.rpn, train)

        per_image_head = {l: (head_out[l][0], head_out[l][1]) for l in levels}
        prop_boxes, prop_scores, prop_valid = jax.vmap(proposals_one)(per_image_head)

        roi = StandardROIHeads(cfg.roi, dtype=self.dtype, name="roi_heads")

        if train:
            if rng is None:
                rng = self.make_rng("sampling")
            sample_keys = jax.random.split(jax.random.fold_in(rng, 0), b)
            rpn_keys = jax.random.split(jax.random.fold_in(rng, 1), b)

            sampled = jax.vmap(
                lambda pb, pv, gb, gc, gv, k: sample_proposals(
                    jax.lax.stop_gradient(pb), pv, gb, gc, gv, k, cfg.roi
                )
            )(prop_boxes, prop_valid, gt_boxes, gt_classes, gt_valid, sample_keys)

            scores, deltas = roi(pyramid, sampled["boxes"], FPN_STRIDES)

            rpn_loss = jax.vmap(
                lambda ho, gb, gv, k: rpn_losses(ho, anchors, gb, gv, k, cfg.rpn)
            )(per_image_head, gt_boxes, gt_valid, rpn_keys)
            roi_loss = jax.vmap(
                lambda s, d, sm: fast_rcnn_losses(s, d, sm, cfg.roi)
            )(scores, deltas, sampled)
            losses = {k: jnp.mean(v) for k, v in {**rpn_loss, **roi_loss}.items()}

            if (cfg.with_mask and gt_masks is not None) or (
                cfg.with_keypoints and gt_keypoints is not None
            ):
                from ..ops.roi_align import multilevel_roi_align, roi_align
                from .cascade import KeypointHead, MaskHead, keypoint_loss, mask_loss

                level_strides = tuple(FPN_STRIDES[l] for l in cfg.roi.in_levels)

                def pool_sampled(image_feats, image_boxes):
                    return multilevel_roi_align(
                        [image_feats[l] for l in cfg.roi.in_levels],
                        image_boxes,
                        cfg.mask_resolution,
                        level_strides,
                        sampling_ratio=cfg.roi.pooler_sampling_ratio,
                    )

                pooled = jax.vmap(pool_sampled)(
                    {l: pyramid[l] for l in cfg.roi.in_levels}, sampled["boxes"]
                )
                bb, rr = pooled.shape[:2]
                flat = pooled.reshape(bb * rr, *pooled.shape[2:])

                if cfg.with_mask and gt_masks is not None:
                    m = 2 * cfg.mask_resolution
                    mask_logits = MaskHead(
                        cfg.roi.num_classes, dtype=self.dtype, name="mask_head"
                    )(flat).reshape(bb, rr, m, m, cfg.roi.num_classes)
                    # Per-ROI GT mask crops (mask_head crop_and_resize): each
                    # sampled proposal carries its matched GT box; recover the
                    # GT index by nearest-box lookup and roi_align the
                    # full-image bitmask over the proposal extent.
                    gt_roi_masks = jax.vmap(
                        lambda om, ob, sb, sgb: jax.vmap(
                            lambda rb, gtb: roi_align(
                                om[jnp.argmin(jnp.sum(jnp.abs(ob - gtb[None]), -1))]
                                .astype(jnp.float32)[..., None],
                                rb[None], m, 1.0, 2,
                            )[0, ..., 0]
                        )(sb, sgb)
                    )(gt_masks, gt_boxes, sampled["boxes"], sampled["gt_boxes"])
                    mloss = jax.vmap(
                        lambda lg, gm, gc, fg: mask_loss(lg, gm > 0.5, gc, fg)
                    )(mask_logits, gt_roi_masks, sampled["gt_classes"], sampled["is_fg"])
                    losses["loss_mask"] = jnp.mean(mloss)

                if cfg.with_keypoints and gt_keypoints is not None:
                    kp_logits = KeypointHead(
                        cfg.num_keypoints, dtype=self.dtype, name="keypoint_head"
                    )(flat)
                    side = kp_logits.shape[1]
                    kp_logits = kp_logits.reshape(bb, rr, side, side, cfg.num_keypoints)

                    def kp_targets(one_kps, one_gtb, sb, sgb):
                        def per_roi(rb, gtb_match):
                            gi = jnp.argmin(jnp.sum(jnp.abs(one_gtb - gtb_match[None]), -1))
                            kps = one_kps[gi]  # (K, 3)
                            x0, y0 = rb[0], rb[1]
                            sw = side / jnp.maximum(rb[2] - rb[0], 1e-6)
                            sh = side / jnp.maximum(rb[3] - rb[1], 1e-6)
                            gx = jnp.clip(((kps[:, 0] - x0) * sw).astype(jnp.int32), 0, side - 1)
                            gy = jnp.clip(((kps[:, 1] - y0) * sh).astype(jnp.int32), 0, side - 1)
                            inside = (
                                (kps[:, 0] >= rb[0]) & (kps[:, 0] < rb[2])
                                & (kps[:, 1] >= rb[1]) & (kps[:, 1] < rb[3])
                                & (kps[:, 2] > 0)
                            )
                            return gy * side + gx, inside.astype(jnp.float32)

                        return jax.vmap(per_roi)(sb, sgb)

                    idx, kvalid = jax.vmap(kp_targets)(
                        gt_keypoints, gt_boxes, sampled["boxes"], sampled["gt_boxes"]
                    )
                    kloss = jax.vmap(keypoint_loss)(kp_logits, idx, kvalid, sampled["is_fg"].astype(jnp.float32))
                    losses["loss_keypoint"] = jnp.mean(kloss)

            losses["loss_total"] = sum(losses.values())
            return losses

        scores, deltas = roi(pyramid, prop_boxes, FPN_STRIDES)
        dets = jax.vmap(
            lambda s, d, p, v: fast_rcnn_inference(s, d, p, v, (h, w), cfg.roi)
        )(scores, deltas, prop_boxes, prop_valid)

        # Optional Mask/Keypoint R-CNN heads on the final detections
        # (roi_heads/mask_head.py, keypoint_head.py inference paths).
        if cfg.with_mask or cfg.with_keypoints:
            from ..ops.roi_align import multilevel_roi_align
            from .cascade import KeypointHead, MaskHead

            level_strides = tuple(FPN_STRIDES[l] for l in cfg.roi.in_levels)

            def pool_dets(image_feats, image_boxes):
                return multilevel_roi_align(
                    [image_feats[l] for l in cfg.roi.in_levels],
                    image_boxes,
                    cfg.mask_resolution,
                    level_strides,
                    sampling_ratio=cfg.roi.pooler_sampling_ratio,
                )

            pooled = jax.vmap(pool_dets)(
                {l: pyramid[l] for l in cfg.roi.in_levels}, dets["boxes"]
            )
            bb, rr = pooled.shape[:2]
            flat = pooled.reshape(bb * rr, *pooled.shape[2:])
            if cfg.with_mask:
                mask_logits = MaskHead(
                    cfg.roi.num_classes, dtype=self.dtype, name="mask_head"
                )(flat)
                dets["mask_logits"] = mask_logits.reshape(bb, rr, *mask_logits.shape[1:])
            if cfg.with_keypoints:
                kp_logits = KeypointHead(
                    cfg.num_keypoints, dtype=self.dtype, name="keypoint_head"
                )(flat)
                dets["keypoint_logits"] = kp_logits.reshape(bb, rr, *kp_logits.shape[1:])
        return dets


def select_best_box(dets: dict, image_hw: tuple) -> Array:
    """Per image: argmax-score box, or the full frame if nothing was
    detected (export_object_detection_bounding_boxes.py:313-322).

    Returns (B, 4) XYXY.
    """
    h, w = image_hw
    scores = jnp.where(dets["valid"], dets["scores"], -jnp.inf)
    best = jnp.argmax(scores, axis=1)
    boxes = jnp.take_along_axis(dets["boxes"], best[:, None, None], axis=1)[:, 0]
    any_valid = jnp.any(dets["valid"], axis=1)
    fallback = jnp.asarray([0.0, 0.0, float(w), float(h)])
    return jnp.where(any_valid[:, None], boxes, fallback)
