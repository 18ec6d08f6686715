"""Mask ops: polygon rasterization + paste-masks-in-image.

XLA equivalents of detectron2's mask machinery: `polygons_to_bitmask`
(structures/masks.py PolygonMasks) via even-odd crossing counts, and
`paste_masks_in_image` (layers/mask_ops.py) which resamples per-ROI
28x28 mask logits into full-image masks with bilinear interpolation —
fixed shapes, batched over ROIs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def polygon_to_bitmask(polygon: Array, height: int, width: int) -> Array:
    """(V, 2) closed polygon -> (H, W) bool mask (even-odd rule at pixel
    centers, matching pycocotools' frPyObjects rasterisation closely)."""
    xs = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1) + 0.5
    ys = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0) + 0.5
    v = polygon.shape[0]
    crossings = jnp.zeros((height, width), jnp.int32)
    for i in range(v):
        x1, y1 = polygon[i, 0], polygon[i, 1]
        x2, y2 = polygon[(i + 1) % v, 0], polygon[(i + 1) % v, 1]
        cond = (y1 <= ys) != (y2 <= ys)
        t = (ys - y1) / jnp.where(y2 - y1 == 0, 1.0, y2 - y1)
        x_int = x1 + t * (x2 - x1)
        crossings = crossings + (cond & (xs < x_int)).astype(jnp.int32)
    return crossings % 2 == 1


def paste_mask_in_image(
    mask: Array,  # (M, M) logits or probabilities for one ROI
    box: Array,  # (4,) XYXY in image coords
    height: int,
    width: int,
    threshold: float = 0.5,
) -> Array:
    """Resample one ROI mask into the full image (mask_ops.py semantics:
    bilinear sampling of the MxM grid over the box extent)."""
    m = mask.shape[0]
    xs = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1) + 0.5
    ys = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0) + 0.5
    x0, y0, x1, y1 = box[0], box[1], box[2], box[3]
    w = jnp.maximum(x1 - x0, 1e-6)
    h = jnp.maximum(y1 - y0, 1e-6)
    # map image pixel centers into mask grid coordinates
    gx = (xs - x0) / w * m - 0.5
    gy = (ys - y0) / h * m - 0.5
    inb = (xs >= x0) & (xs < x1) & (ys >= y0) & (ys < y1)

    gx0 = jnp.clip(jnp.floor(gx), 0, m - 1).astype(jnp.int32)
    gy0 = jnp.clip(jnp.floor(gy), 0, m - 1).astype(jnp.int32)
    gx1 = jnp.clip(gx0 + 1, 0, m - 1)
    gy1 = jnp.clip(gy0 + 1, 0, m - 1)
    fx = jnp.clip(gx - gx0, 0.0, 1.0)
    fy = jnp.clip(gy - gy0, 0.0, 1.0)
    v = (
        mask[gy0, gx0] * (1 - fx) * (1 - fy)
        + mask[gy0, gx1] * fx * (1 - fy)
        + mask[gy1, gx0] * (1 - fx) * fy
        + mask[gy1, gx1] * fx * fy
    )
    return (v > threshold) & inb


def paste_masks_in_image(
    masks: Array,  # (R, M, M)
    boxes: Array,  # (R, 4)
    height: int,
    width: int,
    threshold: float = 0.5,
) -> Array:
    """(R, H, W) pasted boolean masks."""
    return jax.vmap(lambda mk, bx: paste_mask_in_image(mk, bx, height, width, threshold))(
        masks, boxes
    )
