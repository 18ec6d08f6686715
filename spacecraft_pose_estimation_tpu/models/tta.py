"""Test-time augmentation for detection (GeneralizedRCNNWithTTA,
modeling/test_time_augmentation.py): horizontal flip + multi-scale
inference, merged by NMS over the union of detections.

Fixed-shape formulation: each augmented view produces the model's padded
(K, ...) detections; views are concatenated (V*K candidates), boxes are
un-augmented back to original coordinates, then one final NMS + top-k.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from ..ops import nms as nms_ops

Array = jax.Array


def flip_boxes(boxes: Array, width: float) -> Array:
    return jnp.stack(
        [width - boxes[..., 2], boxes[..., 1], width - boxes[..., 0], boxes[..., 3]],
        axis=-1,
    )


def make_tta_inference(
    infer_fn: Callable[[Array], dict],
    scales: Sequence[float] = (1.0,),
    flip: bool = True,
    nms_thresh: float = 0.5,
    max_dets: int = 100,
):
    """Wrap a jitted `images -> padded detections` fn with flip/multiscale
    TTA. Scales resize via jax.image (bilinear) and rescale boxes back."""

    def run(images: Array) -> dict:
        b, h, w = images.shape[0], images.shape[1], images.shape[2]
        views = []

        def add_view(dets, unmap):
            views.append(
                {
                    "boxes": unmap(dets["boxes"]),
                    "scores": dets["scores"],
                    "classes": dets["classes"],
                    "valid": dets["valid"],
                }
            )

        for s in scales:
            if s == 1.0:
                imgs = images
            else:
                nh, nw = int(round(h * s)), int(round(w * s))
                imgs = jax.image.resize(images, (b, nh, nw, images.shape[3]), "bilinear")
            dets = infer_fn(imgs)
            sh = h / imgs.shape[1]
            sw = w / imgs.shape[2]
            scale_back = jnp.asarray([sw, sh, sw, sh])
            add_view(dets, lambda bx, sb=scale_back: bx * sb)
            if flip:
                dets_f = infer_fn(imgs[:, :, ::-1, :])
                add_view(
                    dets_f,
                    lambda bx, sb=scale_back, fw=imgs.shape[2]: flip_boxes(bx, fw) * sb,
                )

        boxes = jnp.concatenate([v["boxes"] for v in views], axis=1)
        scores = jnp.concatenate([v["scores"] for v in views], axis=1)
        classes = jnp.concatenate([v["classes"] for v in views], axis=1)
        valid = jnp.concatenate([v["valid"] for v in views], axis=1)

        def merge_one(bx, sc, cl, va):
            keep = nms_ops.batched_nms_mask(bx, sc, cl, nms_thresh, va)
            masked = jnp.where(keep, sc, -jnp.inf)
            k = min(max_dets, masked.shape[0])
            top, idx = jax.lax.top_k(masked, k)
            return {
                "boxes": bx[idx],
                "scores": jnp.where(jnp.isfinite(top), top, 0.0),
                "classes": cl[idx],
                "valid": jnp.isfinite(top),
            }

        return jax.vmap(merge_one)(boxes, scores, classes, valid)

    return run
