"""Gaussian heatmap target synthesis and sub-pixel peak decoding.

Vectorized XLA equivalents of the reference's per-joint Python loops:

* target synthesis — ``lib/dataset/JointsDataset.py:264-332``
  (`generate_target`), including its quirks: the Gaussian always uses the
  *base* sigma even for the divided multi-scale maps, the peak cell is
  ``int(x / stride + 0.5)`` (truncation), values outside the 6*sigma+1 box
  are exact zeros, and a joint whose box misses the map entirely gets
  target_weight 0.
* decoding — ``lib/core/inference.py:18-79`` (`get_max_preds` /
  `get_final_preds`): argmax peak, +-0.25-pixel shift along the sign of the
  neighbour gradient (only when 1 < p < size-1), then inverse-affine lift
  back to source-image coordinates.

Shapes are channels-last (B, H, W, J) — the TPU-native layout our models
emit — where the reference uses (B, J, H, W).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import geometry

Array = jax.Array


def generate_target(
    joints: Array,
    joints_vis: Array,
    image_size: tuple[int, int],
    heatmap_size: tuple[int, int],
    sigma: float,
) -> tuple[Array, Array]:
    """Per-joint unnormalized Gaussians on the heatmap grid.

    Args:
      joints: (J, 2) joint positions in *input image* pixel coordinates.
      joints_vis: (J,) visibility weight (1 visible, 0 not).
      image_size: (width, height) of the model input.
      heatmap_size: (width, height) of the heatmap.
      sigma: Gaussian sigma in heatmap pixels (center value is 1, not
        normalized).

    Returns:
      target: (Hh, Wh, J) float32 heatmaps.
      target_weight: (J,) — 0 where invisible or the Gaussian box misses
        the map.
    """
    wh, hh = int(heatmap_size[0]), int(heatmap_size[1])
    stride_x = image_size[0] / heatmap_size[0]
    stride_y = image_size[1] / heatmap_size[1]
    tmp_size = int(sigma * 3)

    # Reference: mu = int(joint / stride + 0.5) — C-style truncation.
    mu_x = jnp.trunc(joints[:, 0] / stride_x + 0.5)
    mu_y = jnp.trunc(joints[:, 1] / stride_y + 0.5)

    ul_x, ul_y = mu_x - tmp_size, mu_y - tmp_size
    br_x, br_y = mu_x + tmp_size + 1, mu_y + tmp_size + 1
    in_bounds = ~((ul_x >= wh) | (ul_y >= hh) | (br_x < 0) | (br_y < 0))
    weight = joints_vis.astype(jnp.float32) * in_bounds.astype(jnp.float32)

    xs = jax.lax.broadcasted_iota(jnp.float32, (hh, wh), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (hh, wh), 0)
    dx = xs[:, :, None] - mu_x[None, None, :]
    dy = ys[:, :, None] - mu_y[None, None, :]
    g = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma**2))
    # Outside the [mu - 3s, mu + 3s] box the reference leaves exact zeros.
    box = (jnp.abs(dx) <= tmp_size) & (jnp.abs(dy) <= tmp_size)
    target = jnp.where(box & (weight[None, None, :] > 0.5), g, 0.0)
    return target.astype(jnp.float32), weight


def get_max_preds(heatmaps: Array) -> tuple[Array, Array]:
    """Argmax peak per joint. ``heatmaps``: (B, H, W, J) -> (B, J, 2), (B, J).

    Matches `get_max_preds` (lib/core/inference.py:18-46): coords are
    (x, y); joints whose max is <= 0 get coords zeroed.
    """
    b, h, w, j = heatmaps.shape
    flat = heatmaps.transpose(0, 3, 1, 2).reshape(b, j, h * w)
    idx = jnp.argmax(flat, axis=-1)
    maxvals = jnp.max(flat, axis=-1)
    x = (idx % w).astype(jnp.float32)
    y = jnp.floor(idx.astype(jnp.float32) / w)
    preds = jnp.stack([x, y], axis=-1)
    preds = preds * (maxvals > 0.0)[..., None]
    return preds, maxvals


def _subpixel_shift(heatmaps_bjhw: Array, coords: Array) -> Array:
    """+-0.25-px shift along the neighbour-gradient sign (inference.py:56-69)."""
    b, j, h, w = heatmaps_bjhw.shape
    px = jnp.floor(coords[..., 0] + 0.5).astype(jnp.int32)
    py = jnp.floor(coords[..., 1] + 0.5).astype(jnp.int32)
    ok = (px > 1) & (px < w - 1) & (py > 1) & (py < h - 1)
    pxc = jnp.clip(px, 1, w - 2)
    pyc = jnp.clip(py, 1, h - 2)

    def gather(dy, dx):
        return jnp.take_along_axis(
            heatmaps_bjhw.reshape(b, j, h * w),
            ((pyc + dy) * w + (pxc + dx))[..., None],
            axis=-1,
        )[..., 0]

    diff_x = gather(0, 1) - gather(0, -1)
    diff_y = gather(1, 0) - gather(-1, 0)
    shift = jnp.stack([jnp.sign(diff_x), jnp.sign(diff_y)], axis=-1) * 0.25
    return coords + shift * ok[..., None]


def decode_heatmaps(
    heatmaps: Array,
    centers: Array,
    scales: Array,
    post_process: bool = True,
) -> tuple[Array, Array]:
    """Heatmaps -> keypoints in source-image coordinates (+ confidences).

    Fused equivalent of `get_final_preds` (lib/core/inference.py:49-79).

    Args:
      heatmaps: (B, H, W, J) channels-last heatmaps.
      centers: (B, 2) crop centers in source pixels.
      scales: (B, 2) crop scales (units of 200 px).
      post_process: apply the +-0.25 sub-pixel shift.

    Returns:
      preds: (B, J, 2) keypoints in source-image pixels.
      maxvals: (B, J) peak confidences.
    """
    coords, maxvals = get_max_preds(heatmaps)
    hh, wh = heatmaps.shape[1], heatmaps.shape[2]
    if post_process:
        coords = _subpixel_shift(heatmaps.transpose(0, 3, 1, 2), coords)
    preds = jax.vmap(
        lambda c, ctr, s: geometry.transform_preds(c, ctr, s, (wh, hh))
    )(coords, centers, scales)
    return preds, maxvals
