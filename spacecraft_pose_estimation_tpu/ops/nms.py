"""Padded, mask-based greedy NMS — the XLA-native replacement for the
reference's three native NMS implementations (detectron2 torchvision CUDA
NMS via layers/nms.py:9, the rotated-NMS csrc kernels, and HRNet's
Cython/CUDA lib/nms extension).

Fixed shapes throughout: inputs are padded to N with a validity mask and
the result is a keep *mask*, not a ragged index list — so it jits, vmaps
over images, and fuses into the detection graph.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .boxes import pairwise_iou

Array = jax.Array


def nms_mask(
    boxes: Array,
    scores: Array,
    iou_threshold: float,
    valid: Array | None = None,
) -> Array:
    """Exact greedy NMS. Returns a bool keep-mask in the original order.

    Equivalent to torchvision.ops.nms on the valid subset: iterate boxes
    in descending score order; keep a box iff no higher-scoring kept box
    overlaps it above ``iou_threshold``.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones(n, bool)
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    order = jnp.argsort(jnp.where(valid, scores, neg_inf), descending=True)
    b = boxes[order]
    v = valid[order]
    iou = pairwise_iou(b, b)
    over = iou > iou_threshold

    def loop_body(i, suppressed):
        # A box suppresses others only if it is itself kept; exclude the
        # diagonal so it never suppresses itself.
        keep_i = v[i] & ~suppressed[i]
        mask = (over[i] & keep_i).at[i].set(False)
        return suppressed | mask

    suppressed = jax.lax.fori_loop(0, n, loop_body, jnp.zeros(n, bool))
    keep_sorted = v & ~suppressed
    keep = jnp.zeros(n, bool).at[order].set(keep_sorted)
    return keep


def batched_nms_mask(
    boxes: Array,
    scores: Array,
    class_ids: Array,
    iou_threshold: float,
    valid: Array | None = None,
) -> Array:
    """Class-aware NMS via the coordinate-offset trick
    (detectron2 layers/nms.py batched_nms): boxes of different classes are
    translated far apart so they never suppress each other."""
    max_coord = jnp.max(jnp.abs(boxes)) + 1.0
    offsets = class_ids.astype(boxes.dtype) * (2.0 * max_coord)
    shifted = boxes + offsets[:, None]
    return nms_mask(shifted, scores, iou_threshold, valid)


def top_k_by_score(
    scores: Array, k: int, valid: Array | None = None
) -> tuple[Array, Array]:
    """(values, indices) of the top-k valid scores (invalid -> -inf)."""
    if valid is not None:
        scores = jnp.where(valid, scores, -jnp.inf)
    return jax.lax.top_k(scores, k)
