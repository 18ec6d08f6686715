"""Grid anchor generation (detectron2 DefaultAnchorGenerator,
modeling/anchor_generator.py): per-level cell anchors from sizes x aspect
ratios, broadcast over the feature grid at the level stride."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def cell_anchors(sizes, aspect_ratios) -> np.ndarray:
    """(A, 4) anchors centered at origin: area size^2, h/w = ratio."""
    out = []
    for size in sizes:
        area = float(size) ** 2
        for r in aspect_ratios:
            w = np.sqrt(area / r)
            h = w * r
            out.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return np.asarray(out, np.float32)


def grid_anchors(feat_h: int, feat_w: int, stride: int, base: np.ndarray, offset: float = 0.0):
    """(H*W*A, 4) anchors for one level, row-major over (y, x, a)."""
    shift_x = (np.arange(feat_w) + offset) * stride
    shift_y = (np.arange(feat_h) + offset) * stride
    sx, sy = np.meshgrid(shift_x, shift_y)
    shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)  # (HW, 1, 4)
    anchors = (shifts + base[None, :, :]).reshape(-1, 4)
    return jnp.asarray(anchors, jnp.float32)


def fpn_anchors(
    feat_shapes: dict[str, tuple[int, int]],
    strides: dict[str, int],
    sizes_per_level: dict[str, tuple[float, ...]],
    aspect_ratios: tuple[float, ...] = (0.5, 1.0, 2.0),
):
    """Per-level anchors for an FPN. Returns {level: (Ni, 4)}."""
    return {
        lvl: grid_anchors(h, w, strides[lvl], cell_anchors(sizes_per_level[lvl], aspect_ratios))
        for lvl, (h, w) in feat_shapes.items()
    }
