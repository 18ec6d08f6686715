"""FCOS: anchor-free one-stage detector (detectron2 modeling/meta_arch/
fcos.py parity). Per-location class logits, LINEAR LTRB distance
regression (Box2BoxTransformLinear: distance = relu(pred) * stride) and
centerness; training assigns each location to the smallest GT containing
it within the level's scale range; inference mirrors RetinaNet's
per-level topk -> NMS flow.
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
from .fpn import FPN
from .resnet_backbone import RESNET_TINY, ResNetBackbone, ResNetConfig
from .retinanet import RETINA_STRIDES, sigmoid_focal_loss

Array = jax.Array
Dtype = Any

# per-level object scale ranges (fcos defaults)
SCALE_RANGES = {
    "p3": (0.0, 64.0),
    "p4": (64.0, 128.0),
    "p5": (128.0, 256.0),
    "p6": (256.0, 512.0),
    "p7": (512.0, 1e8),
}


@dataclasses.dataclass(frozen=True)
class FCOSConfig:
    backbone: ResNetConfig = ResNetConfig(depth=50)
    fpn_channels: int = 256
    num_classes: int = 1
    num_convs: int = 4
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    center_sample_radius: float = 1.5  # x stride, FCOS center sampling
    score_thresh: float = 0.05
    nms_thresh: float = 0.6
    topk_candidates: int = 1000
    detections_per_image: int = 100
    prior_prob: float = 0.01


FCOS_TINY = FCOSConfig(
    backbone=RESNET_TINY, fpn_channels=16, num_convs=1, topk_candidates=64,
    detections_per_image=4,
)


class FCOS(nn.Module):
    config: FCOSConfig = FCOSConfig()
    dtype: Dtype = jnp.float32
    pixel_mean: tuple = (103.530, 116.280, 123.675)

    @nn.compact
    def __call__(
        self,
        images: Array,
        gt_boxes: Array | None = None,
        gt_classes: Array | None = None,
        gt_valid: Array | None = None,
        train: bool = False,
        return_raw: bool = False,
    ):
        cfg = self.config
        b, h, w = images.shape[0], images.shape[1], images.shape[2]
        x = images.astype(jnp.float32) - jnp.asarray(self.pixel_mean)
        feats = ResNetBackbone(cfg.backbone, dtype=self.dtype, name="backbone")(x)
        pyr = FPN(
            cfg.fpn_channels, in_levels=("res3", "res4", "res5"),
            last_level_max_pool=False, dtype=self.dtype, name="fpn",
        )(feats)
        # d2 fcos.py builds its pyramid with LastLevelP6P7(in_feature=
        # 'p5'): p6 is a LEARNED stride-2 conv on p5 (not the
        # Faster-RCNN maxpool), p7 = conv(relu(p6))
        p6 = nn.Conv(cfg.fpn_channels, (3, 3), strides=(2, 2), padding=1,
                     dtype=self.dtype, name="p6")(pyr["p5"].astype(self.dtype))
        p7 = nn.Conv(cfg.fpn_channels, (3, 3), strides=(2, 2), padding=1,
                     dtype=self.dtype, name="p7")(nn.relu(p6))
        pyramid = {"p3": pyr["p3"], "p4": pyr["p4"], "p5": pyr["p5"],
                   "p6": p6, "p7": p7}
        levels = sorted(pyramid.keys())

        ch = cfg.fpn_channels
        cls_tower = [nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name=f"cls_conv{i}")
                     for i in range(cfg.num_convs)]
        box_tower = [nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name=f"box_conv{i}")
                     for i in range(cfg.num_convs)]
        bias = nn.initializers.constant(-math.log((1 - cfg.prior_prob) / cfg.prior_prob))
        cls_out = nn.Conv(cfg.num_classes, (3, 3), padding=1, bias_init=bias,
                          dtype=self.dtype, name="cls_score")
        box_out = nn.Conv(4, (3, 3), padding=1, dtype=self.dtype, name="bbox_pred")
        ctr_out = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype, name="centerness")

        logits_all, ltrb_all, ctr_all, centers_all, stride_all, range_all = [], [], [], [], [], []
        for lvl in levels:
            f = pyramid[lvl]
            c = f
            for conv in cls_tower:
                c = nn.relu(conv(c))
            g = f
            for conv in box_tower:
                g = nn.relu(conv(g))
            stride = RETINA_STRIDES[lvl]
            scale = self.param(f"scale_{lvl}", nn.initializers.ones, ())
            logits = cls_out(c).astype(jnp.float32).reshape(b, -1, cfg.num_classes)
            # d2 fcos.py uses Box2BoxTransformLinear(normalize_by_size):
            # distance = relu(pred) * stride — LINEAR, not the original
            # FCOS exp parameterization (box_regression.py:285-295). The
            # per-level learnable scale (init 1) is kept from the paper;
            # it is identity at init.
            ltrb = (
                nn.relu(box_out(g).astype(jnp.float32) * scale) * stride
            ).reshape(b, -1, 4)
            ctr = ctr_out(g).astype(jnp.float32).reshape(b, -1)
            fh, fw = f.shape[1], f.shape[2]
            ys = (jnp.arange(fh) + 0.5) * stride
            xs = (jnp.arange(fw) + 0.5) * stride
            cx, cy = jnp.meshgrid(xs, ys)
            centers = jnp.stack([cx.reshape(-1), cy.reshape(-1)], axis=-1)
            n_l = centers.shape[0]
            logits_all.append(logits)
            ltrb_all.append(ltrb)
            ctr_all.append(ctr)
            centers_all.append(centers)
            stride_all.append(jnp.full(n_l, float(stride)))
            lo, hi = SCALE_RANGES[lvl]
            range_all.append(jnp.tile(jnp.asarray([[lo, hi]]), (n_l, 1)))

        logits = jnp.concatenate(logits_all, axis=1)
        ltrb = jnp.concatenate(ltrb_all, axis=1)
        ctr = jnp.concatenate(ctr_all, axis=1)
        centers = jnp.concatenate(centers_all, axis=0)  # (N, 2)
        ranges = jnp.concatenate(range_all, axis=0)  # (N, 2)
        strides = jnp.concatenate(stride_all, axis=0)  # (N,)

        boxes_pred = jnp.stack(
            [
                centers[None, :, 0] - ltrb[..., 0],
                centers[None, :, 1] - ltrb[..., 1],
                centers[None, :, 0] + ltrb[..., 2],
                centers[None, :, 1] + ltrb[..., 3],
            ],
            axis=-1,
        )

        if return_raw:
            return {"logits": logits, "boxes_pred": boxes_pred, "ctr": ctr,
                    "centers": centers, "ranges": ranges, "ltrb": ltrb}

        if train:
            def one(lg, bp, ct, gb, gc, gv):
                # ltrb of each location wrt each gt: (G, N, 4)
                l = centers[None, :, 0] - gb[:, None, 0]
                t = centers[None, :, 1] - gb[:, None, 1]
                r = gb[:, None, 2] - centers[None, :, 0]
                bmt = gb[:, None, 3] - centers[None, :, 1]
                ltrb_gt = jnp.stack([l, t, r, bmt], axis=-1)
                inside = jnp.min(ltrb_gt, axis=-1) > 0
                max_d = jnp.max(ltrb_gt, axis=-1)
                in_range = (max_d >= ranges[None, :, 0]) & (max_d <= ranges[None, :, 1])
                # center sampling (FCOS "+improvements"): a location is
                # positive only within radius*stride of the gt center
                # (intersected with the gt box via `inside`)
                gt_cx = (gb[:, None, 0] + gb[:, None, 2]) / 2
                gt_cy = (gb[:, None, 1] + gb[:, None, 3]) / 2
                rad = cfg.center_sample_radius * strides[None, :]
                near_center = (jnp.abs(centers[None, :, 0] - gt_cx) <= rad) & (
                    jnp.abs(centers[None, :, 1] - gt_cy) <= rad
                )
                candidate = inside & in_range & near_center & gv[:, None]
                areas = box_ops.box_area(gb)
                area_mat = jnp.where(candidate, areas[:, None], jnp.inf)
                best_gt = jnp.argmin(area_mat, axis=0)  # (N,)
                fg = jnp.any(candidate, axis=0)
                cls_t = jax.nn.one_hot(gc[best_gt], cfg.num_classes) * fg[:, None]
                cls_loss = jnp.sum(
                    sigmoid_focal_loss(lg, cls_t, cfg.focal_alpha, cfg.focal_gamma)
                )
                gt_box = gb[best_gt]
                lt = jnp.take_along_axis(ltrb_gt, best_gt[None, :, None], axis=0)[0]
                lr_min = jnp.minimum(lt[:, 0], lt[:, 2])
                lr_max = jnp.maximum(lt[:, 0], lt[:, 2])
                tb_min = jnp.minimum(lt[:, 1], lt[:, 3])
                tb_max = jnp.maximum(lt[:, 1], lt[:, 3])
                ctr_t = jnp.sqrt(
                    jnp.clip((lr_min / jnp.maximum(lr_max, 1e-6))
                             * (tb_min / jnp.maximum(tb_max, 1e-6)), 0.0, 1.0)
                )
                # FCOS regression: GIoU on decoded boxes, weighted by the
                # centerness target. Return per-image SUMS — the batch
                # totals are normalized below by the batch-level
                # centerness/foreground sums (d2/AdelaiDet semantics:
                # loss_denorm and num_pos are all-reduced across the
                # whole batch, not per image).
                reg = box_ops.giou_loss(bp, gt_box)
                ctr_w = ctr_t * fg
                reg_sum = jnp.sum(reg * ctr_w)
                ctr_loss = optax.sigmoid_binary_cross_entropy(ct, ctr_t)
                return (
                    cls_loss,
                    reg_sum,
                    jnp.sum(ctr_w),
                    jnp.sum(ctr_loss * fg),
                    jnp.sum(fg),
                )

            cls_s, reg_s, ctrw_s, ctr_s, fg_s = jax.vmap(one)(
                logits, boxes_pred, ctr, gt_boxes, gt_classes, gt_valid
            )
            num_pos = jnp.maximum(jnp.sum(fg_s), 1.0)
            loss_denorm = jnp.maximum(jnp.sum(ctrw_s), 1e-6)
            losses = {
                "loss_cls": jnp.sum(cls_s) / num_pos,
                "loss_box_reg": jnp.sum(reg_s) / loss_denorm,
                "loss_centerness": jnp.sum(ctr_s) / num_pos,
            }
            losses["loss_total"] = sum(losses.values())
            return losses

        # per-level candidate budgets (d2 dense_detector semantics, same
        # rationale as models/retinanet.py): static level slices off the
        # concatenated location axis
        level_sizes = [c.shape[0] for c in centers_all]
        offs = [0]
        for n_l in level_sizes:
            offs.append(offs[-1] + n_l)
        cand_s, cand_b, cand_c = [], [], []
        for li in range(len(level_sizes)):
            sl = slice(offs[li], offs[li + 1])
            sc = jnp.sqrt(
                jax.nn.sigmoid(logits[:, sl])
                * jax.nn.sigmoid(ctr[:, sl])[:, :, None]
            ).reshape(b, -1)
            k_l = min(cfg.topk_candidates, sc.shape[1])
            top, idx = jax.lax.top_k(sc, k_l)
            loc = idx // cfg.num_classes
            cand_c.append(idx % cfg.num_classes)
            cand_s.append(top)
            cand_b.append(
                jnp.take_along_axis(boxes_pred[:, sl], loc[..., None], axis=1)
            )
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
