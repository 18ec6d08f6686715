"""Batched on-device affine warp (bilinear, zero border).

Replaces the reference's CPU-side ``cv2.warpAffine(..., INTER_LINEAR)``
crop in the dataloader (lib/dataset/JointsDataset.py:190-195) with an XLA
gather-based bilinear sampler, so detect -> crop -> regress fuses into one
compiled graph. Convention matches cv2: the affine maps *source* pixel
coordinates to *destination* coordinates on the integer grid; sampling
uses the inverse map; samples outside the source are zero
(BORDER_CONSTANT 0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import geometry

Array = jax.Array


def affine_warp(image: Array, M_inv: Array, out_size: tuple[int, int]) -> Array:
    """Warp one image. ``M_inv`` maps dst pixel coords -> src pixel coords.

    Args:
      image: (H, W, C) source.
      M_inv: (2, 3) inverse affine (dst -> src).
      out_size: (width, height) of the output.

    Returns:
      (out_h, out_w, C) warped image, dtype follows the input's promotion
      with float32 weights.
    """
    h, w = image.shape[0], image.shape[1]
    out_w, out_h = int(out_size[0]), int(out_size[1])

    xd = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    yd = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    xs = M_inv[0, 0] * xd + M_inv[0, 1] * yd + M_inv[0, 2]
    ys = M_inv[1, 0] * xd + M_inv[1, 1] * yd + M_inv[1, 2]

    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = xs - x0
    fy = ys - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    img_f = image.astype(jnp.float32)

    def sample_f(yi, xi):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1)
        yi_c = jnp.clip(yi, 0, h - 1)
        return img_f[yi_c, xi_c] * inb[..., None]

    v00 = sample_f(y0i, x0i)
    v01 = sample_f(y0i, x0i + 1)
    v10 = sample_f(y0i + 1, x0i)
    v11 = sample_f(y0i + 1, x0i + 1)
    wx = fx[..., None]
    wy = fy[..., None]
    out = (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )
    return out


def crop_and_resize(
    image: Array,
    center: Array,
    scale: Array,
    rot_deg: Array,
    out_size: tuple[int, int],
) -> Array:
    """Crop a center/scale/rot box and resample to ``out_size`` (w, h).

    The fused equivalent of get_affine_transform + cv2.warpAffine in the
    reference's __getitem__ path.
    """
    M_inv = geometry.crop_affine_matrix(center, scale, rot_deg, out_size, inv=True)
    return affine_warp(image, M_inv, out_size)


def batched_crop_and_resize(
    images: Array,
    centers: Array,
    scales: Array,
    rots: Array,
    out_size: tuple[int, int],
) -> Array:
    """vmap of `crop_and_resize` over a leading batch axis."""
    return jax.vmap(lambda im, c, s, r: crop_and_resize(im, c, s, r, out_size))(
        images, centers, scales, rots
    )
