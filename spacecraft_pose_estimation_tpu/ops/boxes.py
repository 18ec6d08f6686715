"""Box arithmetic: IoU, delta transforms, clipping (fixed-shape, XLA-safe).

Functional equivalents of detectron2's `Boxes`/`Box2BoxTransform`/`Matcher`
structures (structures/boxes.py, modeling/box_regression.py:369,
modeling/matcher.py) as pure array ops. Boxes are (..., 4) XYXY float.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array

# Maximum dw/dh so exp() cannot overflow (detectron2 _DEFAULT_SCALE_CLAMP).
SCALE_CLAMP = math.log(1000.0 / 16)


def box_area(boxes: Array) -> Array:
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0) * jnp.maximum(
        boxes[..., 3] - boxes[..., 1], 0
    )


def pairwise_iou(a: Array, b: Array) -> Array:
    """(Na, 4) x (Nb, 4) -> (Na, Nb) IoU."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def clip_boxes(boxes: Array, height: float, width: float) -> Array:
    x0 = jnp.clip(boxes[..., 0], 0, width)
    y0 = jnp.clip(boxes[..., 1], 0, height)
    x1 = jnp.clip(boxes[..., 2], 0, width)
    y1 = jnp.clip(boxes[..., 3], 0, height)
    return jnp.stack([x0, y0, x1, y1], axis=-1)


def nonempty_mask(boxes: Array, threshold: float = 0.0) -> Array:
    return ((boxes[..., 2] - boxes[..., 0]) > threshold) & (
        (boxes[..., 3] - boxes[..., 1]) > threshold
    )


def get_deltas(src: Array, target: Array, weights=(1.0, 1.0, 1.0, 1.0)) -> Array:
    """Encode target boxes as (dx, dy, dw, dh) deltas wrt src (anchor) boxes."""
    sw = src[..., 2] - src[..., 0]
    sh = src[..., 3] - src[..., 1]
    scx = src[..., 0] + 0.5 * sw
    scy = src[..., 1] + 0.5 * sh
    tw = target[..., 2] - target[..., 0]
    th = target[..., 3] - target[..., 1]
    tcx = target[..., 0] + 0.5 * tw
    tcy = target[..., 1] + 0.5 * th
    wx, wy, ww, wh = weights
    dx = wx * (tcx - scx) / jnp.maximum(sw, 1e-7)
    dy = wy * (tcy - scy) / jnp.maximum(sh, 1e-7)
    dw = ww * jnp.log(jnp.maximum(tw, 1e-7) / jnp.maximum(sw, 1e-7))
    dh = wh * jnp.log(jnp.maximum(th, 1e-7) / jnp.maximum(sh, 1e-7))
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def apply_deltas(deltas: Array, boxes: Array, weights=(1.0, 1.0, 1.0, 1.0)) -> Array:
    """Decode deltas against boxes (Box2BoxTransform.apply_deltas)."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    wx, wy, ww, wh = weights
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, SCALE_CLAMP)
    dh = jnp.minimum(deltas[..., 3] / wh, SCALE_CLAMP)
    pcx = dx * w + cx
    pcy = dy * h + cy
    pw = jnp.exp(dw) * w
    ph = jnp.exp(dh) * h
    return jnp.stack(
        [pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw, pcy + 0.5 * ph], axis=-1
    )


def elementwise_iou(a: Array, b: Array) -> Array:
    """(..., 4) x (..., 4) -> (...) IoU of paired boxes."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a) + box_area(b) - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def giou_loss(pred: Array, target: Array) -> Array:
    """Generalized IoU loss (layers/losses.py family), elementwise."""
    iou = elementwise_iou(pred, target)
    lt = jnp.minimum(pred[..., :2], target[..., :2])
    rb = jnp.maximum(pred[..., 2:], target[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    enclose = jnp.maximum(wh[..., 0] * wh[..., 1], 1e-12)
    inter_lt = jnp.maximum(pred[..., :2], target[..., :2])
    inter_rb = jnp.minimum(pred[..., 2:], target[..., 2:])
    inter = jnp.prod(jnp.maximum(inter_rb - inter_lt, 0.0), axis=-1)
    union = box_area(pred) + box_area(target) - inter
    return 1.0 - iou + (enclose - union) / enclose


def _centers_wh(b: Array):
    wh = jnp.maximum(b[..., 2:] - b[..., :2], 0.0)
    c = (b[..., :2] + b[..., 2:]) * 0.5
    return c, wh


def diou_loss(pred: Array, target: Array) -> Array:
    """Distance-IoU loss (layers/losses.py:diou_loss semantics)."""
    iou = elementwise_iou(pred, target)
    cp, _ = _centers_wh(pred)
    ct, _ = _centers_wh(target)
    center_dist = jnp.sum((cp - ct) ** 2, axis=-1)
    lt = jnp.minimum(pred[..., :2], target[..., :2])
    rb = jnp.maximum(pred[..., 2:], target[..., 2:])
    diag = jnp.maximum(jnp.sum((rb - lt) ** 2, axis=-1), 1e-12)
    return 1.0 - iou + center_dist / diag


def ciou_loss(pred: Array, target: Array) -> Array:
    """Complete-IoU loss: DIoU + aspect-ratio consistency term."""
    import math

    iou = elementwise_iou(pred, target)
    d = diou_loss(pred, target)
    _, wp = _centers_wh(pred)
    _, wt = _centers_wh(target)
    v = (4 / math.pi**2) * (
        jnp.arctan(wt[..., 0] / jnp.maximum(wt[..., 1], 1e-12))
        - jnp.arctan(wp[..., 0] / jnp.maximum(wp[..., 1], 1e-12))
    ) ** 2
    alpha = v / jnp.maximum(1.0 - iou + v, 1e-12)
    return d + jax.lax.stop_gradient(alpha) * v


def match_to_gt(
    iou: Array,
    thresholds: tuple[float, ...],
    labels: tuple[int, ...],
    allow_low_quality: bool = False,
) -> tuple[Array, Array]:
    """detectron2 `Matcher`: per-candidate best GT + quality label.

    Args:
      iou: (G, N) IoU of G ground-truth boxes vs N candidates. G may be
        padded with zero rows (empty GT handled: all labels -> labels[0]).
      thresholds: ascending cut points, e.g. (0.3, 0.7).
      labels: len(thresholds)+1 labels per interval, from lowest, each in
        {-1, 0, 1} (ignore / negative / positive).
      allow_low_quality: also mark, for each GT, its argmax candidates
        positive (matcher.py set_low_quality_matches_).

    Returns:
      matched_idx: (N,) best GT index per candidate.
      match_labels: (N,) in {-1, 0, 1}.
    """
    matched_vals = jnp.max(iou, axis=0)
    matched_idx = jnp.argmax(iou, axis=0)
    label = jnp.full(iou.shape[1], labels[0], jnp.int32)
    cuts = (0.0,) + tuple(thresholds) + (float("inf"),)
    for (low, high), lab in zip(zip(cuts[:-1], cuts[1:]), labels):
        label = jnp.where((matched_vals >= low) & (matched_vals < high), jnp.int32(lab), label)
    if allow_low_quality:
        # For each GT row, its max-IoU value; candidates achieving it
        # (with ties) become positive — including the ties-with-equal-
        # quality semantics of matcher.py:105-127.
        per_gt_max = jnp.max(iou, axis=1, keepdims=True)  # (G, 1)
        is_best = (iou == per_gt_max) & (per_gt_max > 0)
        best_any = jnp.any(is_best, axis=0)
        label = jnp.where(best_any, jnp.int32(1), label)
    return matched_idx, label
