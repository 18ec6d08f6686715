"""PointSup project: point-supervised instance segmentation (TPU-native).

Semantic contract from the reference ``projects/PointSup/point_sup/``:

* annotated points come in image coordinates with {0, 1} labels; they
  are box-normalized against the proposal and points falling outside
  the proposal box get label -1 (ignored) — point_utils.py:7-52.
* ``MaskRCNNConvUpsamplePointSupHead``: run the standard mask head,
  point-sample its mask logits at the annotated points, train with the
  PointRend point BCE instead of the dense mask loss
  (mask_head.py:21-67).
* ``ImplicitPointRendPointSupHead``: ImplicitPointRend whose train
  points are the annotation points instead of uniform samples
  (mask_head.py:71-77).

Fixed-shape: R instances x P annotated points, padded + masked.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .point_rend import point_sample, roi_mask_point_loss

Array = jax.Array


def point_coords_wrt_box(boxes: Array, coords: Array) -> Array:
    """Image-coordinate points -> box-normalized [0,1]² (point_utils.py:
    55-84). boxes (R, 4) xyxy; coords (R, P, 2) (x, y) pixels."""
    wh = boxes[:, None, 2:4] - boxes[:, None, 0:2]
    return (coords - boxes[:, None, 0:2]) / wh


def point_labels_from_annotation(
    boxes: Array,  # (R, 4) proposal boxes
    point_coords: Array,  # (R, P, 2) annotated points, image coords
    point_labels: Array,  # (R, P) in {0, 1}
) -> tuple[Array, Array]:
    """-> (box-normalized coords (R, P, 2), labels with out-of-box
    points set to -1) — point_utils.py:7-52."""
    wrt = point_coords_wrt_box(boxes, point_coords)
    outside = (
        (wrt[..., 0] < 0) | (wrt[..., 0] > 1) | (wrt[..., 1] < 0) | (wrt[..., 1] > 1)
    )
    labels = jnp.where(outside, -1.0, point_labels.astype(jnp.float32))
    return wrt, labels


def mask_rcnn_point_sup_loss(
    mask_logits: Array,  # (R, M, M, C) the standard mask head's output
    boxes: Array,  # (R, 4) proposal boxes
    point_coords: Array,  # (R, P, 2) annotated points, image coords
    point_labels: Array,  # (R, P) {0, 1}
    gt_classes: Array | None,
    valid: Array | None = None,
) -> Array:
    """Point-supervised replacement for the dense mask loss
    (mask_head.py:31-67): sample the head's logits at the annotated
    points (box-normalized — the mask logits live in box space) and
    apply the PointRend point BCE."""
    coords, labels = point_labels_from_annotation(boxes, point_coords, point_labels)
    logits = point_sample(mask_logits, coords)  # (R, P, C)
    return roi_mask_point_loss(logits, labels, gt_classes, valid)


def implicit_point_sup_train_points(
    boxes: Array, point_coords: Array, point_labels: Array
) -> tuple[Array, Array]:
    """Training-point source for ImplicitPointRendMaskHead under point
    supervision (mask_head.py:71-77): the annotation points, not
    uniform samples. Returns (box-normalized coords, labels)."""
    return point_labels_from_annotation(boxes, point_coords, point_labels)
