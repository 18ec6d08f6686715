"""ROIAlign as an XLA bilinear gather — replaces the reference's CUDA op
(detectron2 layers/csrc ROIAlign / torchvision roi_align wrapped at
layers/roi_align.py:7-66).

Semantics match `aligned=True` (the detectron2 default): box coordinates
are continuous, a half-pixel offset aligns them with pixel centers, each
output bin averages ``sampling_ratio**2`` bilinear samples placed on a
regular sub-grid. Fixed shapes: boxes are padded; invalid boxes simply
produce garbage bins that downstream masks ignore.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


def _bilinear(feat: Array, y: Array, x: Array) -> Array:
    """Sample feat (H, W, C) at continuous (y, x) grids -> (..., C).

    Out-of-range samples contribute zero (matching the CUDA kernel)."""
    h, w = feat.shape[0], feat.shape[1]
    inb = (y > -1.0) & (y < h) & (x > -1.0) & (x < w)
    y = jnp.clip(y, 0.0, h - 1)
    x = jnp.clip(x, 0.0, w - 1)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    fy = (y - y0)[..., None]
    fx = (x - x0)[..., None]
    v00 = feat[y0, x0]
    v01 = feat[y0, x1]
    v10 = feat[y1, x0]
    v11 = feat[y1, x1]
    out = (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )
    return out * inb[..., None]


def roi_align(
    feat: Array,
    boxes: Array,
    output_size: int,
    spatial_scale: float,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> Array:
    """ROIAlign one feature map for many boxes.

    Args:
      feat: (H, W, C) one image's feature map.
      boxes: (R, 4) XYXY boxes in *input image* coordinates.
      output_size: P — output bins are (P, P).
      spatial_scale: feature stride reciprocal (e.g. 1/16).
      sampling_ratio: sub-samples per bin edge (the CUDA default 0 means
        adaptive ceil(bin size); XLA needs it static — 2 matches zoo
        configs).

    Returns:
      (R, P, P, C) pooled features.
    """
    p = output_size
    s = sampling_ratio
    offset = 0.5 if aligned else 0.0

    def one_box(box):
        x0 = box[0] * spatial_scale - offset
        y0 = box[1] * spatial_scale - offset
        x1 = box[2] * spatial_scale - offset
        y1 = box[3] * spatial_scale - offset
        bw = x1 - x0
        bh = y1 - y0
        if not aligned:
            bw = jnp.maximum(bw, 1.0)
            bh = jnp.maximum(bh, 1.0)
        bin_w = bw / p
        bin_h = bh / p
        # sub-sample grid: bin i, sample k at (i + (k+0.5)/s) * bin
        grid = (jnp.arange(p)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s).reshape(-1)
        ys = y0 + grid * bin_h  # (p*s,)
        xs = x0 + grid * bin_w
        yy = jnp.broadcast_to(ys[:, None], (p * s, p * s))
        xx = jnp.broadcast_to(xs[None, :], (p * s, p * s))
        samples = _bilinear(feat, yy, xx)  # (p*s, p*s, C)
        c = samples.shape[-1]
        pooled = samples.reshape(p, s, p, s, c).mean(axis=(1, 3))
        return pooled

    return jax.vmap(one_box)(boxes)


def roi_align_windowed(
    feat: Array,
    boxes: Array,
    output_size: int,
    spatial_scale: float,
    sampling_ratio: int = 2,
    window: int = 48,
) -> Array:
    """MXU formulation of aligned ROIAlign: per box, dynamic-slice a
    (window, window) patch and contract it with combined
    interpolate-then-average matrices (bilinear sampling + bin averaging
    are both linear in the patch, so the whole op is two small matmuls).

    TPU gathers are the detector's warp-problem all over again; this
    path replaces ~1e8 random-point gathers with contiguous slices +
    matmuls. Exact wherever the box's feature-space extent (+1 px of
    bilinear support) fits in `window`; larger boxes lose their outer
    taps (the canonical FPN level assignment keeps extents ~14-28 px,
    so `window=48` is exact in practice).
    """
    p = output_size
    s = sampling_ratio
    h, w = feat.shape[0], feat.shape[1]

    def one_box(box):
        x0 = box[0] * spatial_scale - 0.5
        y0 = box[1] * spatial_scale - 0.5
        x1 = box[2] * spatial_scale - 0.5
        y1 = box[3] * spatial_scale - 0.5
        bin_w = (x1 - x0) / p
        bin_h = (y1 - y0) / p
        # sample coordinates (p*s per axis)
        grid = (jnp.arange(p)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s).reshape(-1)
        sx = x0 + grid * bin_w
        sy = y0 + grid * bin_h

        ox = jnp.clip(jnp.floor(x0).astype(jnp.int32) - 1, 0, max(w - window, 0))
        oy = jnp.clip(jnp.floor(y0).astype(jnp.int32) - 1, 0, max(h - window, 0))
        patch = jax.lax.dynamic_slice(
            feat, (oy, ox, 0), (min(window, h), min(window, w), feat.shape[2])
        )

        def interp_avg_matrix(coords, origin, size_limit):
            # (p*s, window) bilinear taps relative to the window origin,
            # averaged into (p, window). Matches `_bilinear` exactly:
            # coords within (-1, size) are CLAMPED into [0, size-1] before
            # the hat weights (border samples collapse onto the edge texel);
            # outside that range the sample is zero.
            inb = (coords > -1.0) & (coords < size_limit)
            cc = jnp.clip(coords, 0.0, size_limit - 1)
            k = jax.lax.broadcasted_iota(
                jnp.float32, (coords.shape[0], min(window, size_limit)), 1
            )
            rel = cc[:, None] - origin
            wgt = jnp.maximum(0.0, 1.0 - jnp.abs(rel - k))
            wgt = wgt * inb[:, None]
            return wgt.reshape(p, s, -1).mean(axis=1)  # (p, window)

        Wx = interp_avg_matrix(sx, ox, w)
        Wy = interp_avg_matrix(sy, oy, h)
        tmp = jnp.einsum("pw,hwc->phc", Wx, patch.astype(jnp.float32))
        return jnp.einsum("qh,phc->qpc", Wy, tmp)

    return jax.vmap(one_box)(boxes)


def _check_window_covers(feats, strides, canonical_size, canonical_level, window):
    """Trace-time guard for the windowed/Pallas pooler paths: boxes whose
    feature-space extent (+1 px bilinear support each side) exceeds
    `window` silently lose their outer taps. Middle pyramid levels are
    bounded by the canonical assignment (sqrt(area)/stride < 2 *
    canonical_size / 2**canonical_level = 28 for the FPN defaults), but
    the COARSEST level takes every larger box — e.g. the full-frame
    fallback — so its worst case is the full feature map. Feature shapes
    are static under jit, so this check costs nothing at runtime."""
    import math
    import warnings

    # canonical assignment sends sqrt(area) < canonical_size * 2**(l+1-CL)
    # to level l; in feature units that is < 2 * canonical_size / 2**CL.
    mid_extent = int(math.ceil(2.0 * canonical_size / (2 ** canonical_level))) + 2
    coarse_extent = max(feats[-1].shape[0], feats[-1].shape[1]) + 2
    worst = max(mid_extent, coarse_extent)
    if window < worst:
        warnings.warn(
            f"windowed ROI pooler: window={window} cannot cover the worst-case "
            f"box extent ({worst} cells at the coarsest level, {feats[-1].shape[:2]} "
            f"feature map) — oversized boxes (e.g. the full-frame fallback) will "
            f"lose outer bilinear taps. Use window>={worst} or impl='gather'.",
            stacklevel=3,
        )


def multilevel_roi_align(
    feats: list[Array],
    boxes: Array,
    output_size: int,
    strides: tuple[int, ...],
    canonical_size: float = 224.0,
    canonical_level: int = 4,
    sampling_ratio: int = 2,
    impl: str = "gather",
    window: int = 48,
) -> Array:
    """FPN ROIPooler: assign each box to a pyramid level by scale, pool
    there (modeling/poolers.py:22-113 assign_boxes_to_levels + ROIAlign).

    XLA formulation: pool every box on every level, then select the
    assigned level's result — trades FLOPs for static shapes. With <=
    a few hundred boxes and 7x7 outputs this is cheap.
    """
    import math

    num_levels = len(feats)
    # level assignment (poolers.py:assign_boxes_to_levels)
    lvl_min = int(math.log2(strides[0]))
    areas = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )
    sqrt_area = jnp.sqrt(areas)
    target = jnp.floor(canonical_level + jnp.log2(sqrt_area / canonical_size + 1e-8))
    target = jnp.clip(target, lvl_min, lvl_min + num_levels - 1).astype(jnp.int32) - lvl_min

    if impl == "windowed":
        _check_window_covers(feats, strides, canonical_size, canonical_level, window)
        pooled_all = jnp.stack(
            [
                roi_align_windowed(f, boxes, output_size, 1.0 / s, sampling_ratio, window)
                for f, s in zip(feats, strides)
            ]
        )
    else:
        pooled_all = jnp.stack(
            [
                roi_align(f, boxes, output_size, 1.0 / s, sampling_ratio)
                for f, s in zip(feats, strides)
            ]
        )  # (L, R, P, P, C)
    sel = jax.nn.one_hot(target, num_levels, axis=0)  # (L, R)
    return jnp.einsum("lr,lrpqc->rpqc", sel, pooled_all)
