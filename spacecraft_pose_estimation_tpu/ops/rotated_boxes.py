"""Rotated boxes: IoU via polygon clipping + rotated NMS.

XLA-native replacement for detectron2's box_iou_rotated / nms_rotated
CUDA+CPU kernels (layers/csrc/box_iou_rotated, nms_rotated) and the
RotatedBoxes structure ops (structures/rotated_boxes.py).

Boxes are (cx, cy, w, h, angle_deg) with angle counter-clockwise (the
detectron2 convention). Intersection area comes from Sutherland-Hodgman
clipping of one rectangle against the other's four half-planes —
fixed-size: a 4-gon clipped by 4 half-planes has at most 8 vertices, so
every intermediate polygon is padded to 8 with a validity count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_MAX_V = 8


def box_to_corners(box: Array) -> Array:
    """(5,) rotated box -> (4, 2) corners, CCW order."""
    cx, cy, w, h, a = box[0], box[1], box[2], box[3], box[4]
    t = jnp.deg2rad(a)
    c, s = jnp.cos(t), jnp.sin(t)
    dx = jnp.asarray([-0.5, 0.5, 0.5, -0.5]) * w
    dy = jnp.asarray([-0.5, -0.5, 0.5, 0.5]) * h
    x = cx + c * dx - s * dy
    y = cy + s * dx + c * dy
    return jnp.stack([x, y], axis=-1)


def _clip_halfplane(poly: Array, count: Array, p0: Array, p1: Array):
    """Clip padded polygon (MAX_V, 2) with `count` valid vertices against
    the half-plane left of edge p0->p1. Returns (new_poly, new_count)."""
    d = p1 - p0

    def side(pt):
        return d[0] * (pt[..., 1] - p0[1]) - d[1] * (pt[..., 0] - p0[0])

    idx = jnp.arange(_MAX_V)
    cur = poly
    nxt = poly[(idx + 1) % jnp.maximum(count, 1)]
    s_cur = side(cur)
    s_nxt = side(nxt)
    valid = idx < count

    inside_cur = s_cur >= 0
    inside_nxt = s_nxt >= 0
    denom = s_cur - s_nxt
    tpar = jnp.where(jnp.abs(denom) > 1e-12, s_cur / jnp.where(denom == 0, 1.0, denom), 0.0)
    inter = cur + tpar[:, None] * (nxt - cur)

    # Each edge emits up to 2 points: (nxt if inside_nxt) and (inter if
    # crossing). Build the output by scanning edges in order.
    emit_a = valid & inside_cur  # current point kept
    emit_b = valid & (inside_cur != inside_nxt)  # crossing point

    # flatten candidate list in edge order: [cur_0, inter_0, cur_1, ...]
    cand = jnp.stack([cur, inter], axis=1).reshape(2 * _MAX_V, 2)
    keep = jnp.stack([emit_a, emit_b], axis=1).reshape(2 * _MAX_V)

    order = jnp.argsort(~keep, stable=True)  # kept first, stable order
    new_poly = cand[order][:_MAX_V]
    new_count = jnp.minimum(jnp.sum(keep), _MAX_V)
    return new_poly, new_count


def _polygon_area(poly: Array, count: Array) -> Array:
    idx = jnp.arange(_MAX_V)
    valid = idx < count
    nxt = poly[(idx + 1) % jnp.maximum(count, 1)]
    cross = poly[:, 0] * nxt[:, 1] - nxt[:, 0] * poly[:, 1]
    return 0.5 * jnp.abs(jnp.sum(jnp.where(valid, cross, 0.0)))


def rotated_intersection_area(box_a: Array, box_b: Array) -> Array:
    """Intersection area of two rotated boxes."""
    poly = jnp.zeros((_MAX_V, 2)).at[:4].set(box_to_corners(box_a))
    count = jnp.asarray(4)
    corners_b = box_to_corners(box_b)

    def body(i, state):
        poly, count = state
        p0 = corners_b[i]
        p1 = corners_b[(i + 1) % 4]
        return _clip_halfplane(poly, count, p0, p1)

    poly, count = jax.lax.fori_loop(0, 4, body, (poly, count))
    return jnp.where(count >= 3, _polygon_area(poly, count), 0.0)


def pairwise_iou_rotated(a: Array, b: Array) -> Array:
    """(Na, 5) x (Nb, 5) -> (Na, Nb) rotated IoU."""

    def one(ba, bb):
        inter = rotated_intersection_area(ba, bb)
        area_a = ba[2] * ba[3]
        area_b = bb[2] * bb[3]
        union = area_a + area_b - inter
        return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)

    return jax.vmap(lambda ba: jax.vmap(lambda bb: one(ba, bb))(b))(a)


def nms_rotated_mask(
    boxes: Array,  # (N, 5)
    scores: Array,
    iou_threshold: float,
    valid: Array | None = None,
) -> Array:
    """Greedy rotated NMS keep-mask (nms_rotated kernel semantics)."""
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones(n, bool)
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    order = jnp.argsort(jnp.where(valid, scores, neg_inf), descending=True)
    b = boxes[order]
    v = valid[order]
    iou = pairwise_iou_rotated(b, b)
    over = iou > iou_threshold

    def loop_body(i, suppressed):
        keep_i = v[i] & ~suppressed[i]
        mask = (over[i] & keep_i).at[i].set(False)
        return suppressed | mask

    suppressed = jax.lax.fori_loop(0, n, loop_body, jnp.zeros(n, bool))
    keep_sorted = v & ~suppressed
    return jnp.zeros(n, bool).at[order].set(keep_sorted)
