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


def _interp_matrix(src_coords: Array, src_size: int) -> Array:
    """(out,) continuous source coords -> (out, src) bilinear weights.

    Row j holds the two linear-interpolation taps for sample position
    src_coords[j]; samples outside [-1, src) contribute zero (the
    BORDER_CONSTANT 0 of cv2.warpAffine).
    """
    k = jax.lax.broadcasted_iota(jnp.float32, (src_coords.shape[0], src_size), 1)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(src_coords[:, None] - k))
    inb = (src_coords > -1.0) & (src_coords < src_size)
    return w * inb[:, None]


def crop_and_resize_mxu(
    image: Array,
    center: Array,
    scale: Array,
    out_size: tuple[int, int],
    compute_dtype=None,
) -> Array:
    """Axis-aligned (rot=0) crop+resize as two MXU matmuls.

    TPU gathers are slow; an unrotated similarity warp is separable, so
    we build dense 1-D interpolation matrices and contract them with the
    image — identical bilinear math to `affine_warp` at rot=0, but it
    runs on the systolic array (~100x faster than the gather path for
    1920x1200 -> 512x512 crops).

    compute_dtype: None (f32 exact), jnp.bfloat16 (error <= ~1 grey), or
    jnp.int8 — the serving fast path: taps quantized to 1/127, the image
    recentred to int8 via x-128 (the shift is corrected with the taps'
    row sums; the u8->i8 conversion is loop-invariant in a serving scan,
    so it amortises to zero). int8 matmuls run ~2x bf16 on v5e;
    error <= ~2 grey levels on 0..255 data.
    """
    out_w, out_h = int(out_size[0]), int(out_size[1])
    M_inv = geometry.crop_affine_matrix(center, scale, 0.0, out_size, inv=True)
    # rot=0: x_src = a*x_dst + bx; y_src = a*y_dst + by (isotropic scale).
    xs = M_inv[0, 0] * jnp.arange(out_w, dtype=jnp.float32) + M_inv[0, 2]
    ys = M_inv[1, 1] * jnp.arange(out_h, dtype=jnp.float32) + M_inv[1, 2]
    Wx = _interp_matrix(xs, image.shape[1])  # (out_w, W)
    Wy = _interp_matrix(ys, image.shape[0])  # (out_h, H)
    if compute_dtype == jnp.int8:
        return _crop_mxu_int8(image, Wx, Wy)
    if compute_dtype is not None:
        # serving fast path: bf16 interpolation taps with f32 accumulation
        # (error <= ~1 grey level on 0-255 inputs, 4x MXU rate)
        img = image.astype(compute_dtype)
        Wx = Wx.astype(compute_dtype)
        Wy = Wy.astype(compute_dtype)
        tmp = jnp.einsum("hwc,ow->hoc", img, Wx, preferred_element_type=jnp.float32)
        return jnp.einsum(
            "hoc,ph->poc", tmp.astype(compute_dtype), Wy,
            preferred_element_type=jnp.float32,
        )
    img = image.astype(jnp.float32)
    tmp = jnp.einsum("hwc,ow->hoc", img, Wx, precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("hoc,ph->poc", tmp, Wy, precision=jax.lax.Precision.HIGHEST)


def _crop_mxu_int8(image: Array, Wx: Array, Wy: Array) -> Array:
    """int8 separable warp: image recentred (u8 - 128 -> i8), taps
    quantized symmetric per-matrix; int32 accumulation is exact given
    the int8 operands, so the only error is tap quantization (<= 1/254
    relative per axis) and the intermediate requant (<= ~1 grey)."""
    # recentre: hoisted out of serving scans (image is loop-invariant)
    img_i8 = (image.astype(jnp.int32) - 128).astype(jnp.int8)
    sx = 127.0
    Wx8 = jnp.clip(jnp.round(Wx * sx), -127, 127).astype(jnp.int8)
    Wy8 = jnp.clip(jnp.round(Wy * sx), -127, 127).astype(jnp.int8)
    # contract H first: tmp[o, w, c] = sum_h Wy8[o, h] * img[h, w, c]
    tmp = jnp.einsum(
        "hwc,oh->owc", img_i8, Wy8, preferred_element_type=jnp.int32
    )
    # requant tmp (range ~ +-127*127) back to int8 around its own scale
    tmp_i8 = jnp.clip(jnp.round(tmp.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    out = jnp.einsum(
        "owc,pw->opc", tmp_i8, Wx8, preferred_element_type=jnp.int32
    )
    # undo the remaining tap scale (tmp was already descaled once) and
    # the -128 recentre: x = y/sx + 128*rowsum_y*rowsum_x
    corr = jnp.einsum("oh->o", Wy8.astype(jnp.float32))[:, None] * jnp.einsum(
        "pw->p", Wx8.astype(jnp.float32)
    )[None, :] * (128.0 / (sx * sx))
    return out.astype(jnp.float32) / sx + corr[..., None]


def crop_and_resize_mxu_windowed(
    image: Array,
    center: Array,
    scale: Array,
    out_size: tuple[int, int],
    window: int,
    compute_dtype=None,
) -> Array:
    """Separable MXU crop on a static ``window``-square slice around the
    box center, instead of contracting the full frame.

    The full-frame separable warp is FLOP-bound on the frame size
    (1200x1920 -> 512^2 costs ~10 GFLOP/frame, ~7.9 ms/b128 measured —
    the dominant non-model cost of the serving pipeline). Slicing a
    static window first cuts the contraction to the window (768^2: ~3
    GFLOP/frame); `jax.lax.dynamic_slice` is pure data movement.

    EXACT-equivalence precondition: scale <= window (same contract as
    the Pallas windowed kernel — clamp with
    pallas_crop.clamp_scales_to_window). Boxes at the frame border keep
    cv2's BORDER_CONSTANT-0 semantics: the window is clamped inside the
    frame, and crop taps outside it are zeroed exactly where the
    full-frame warp would sample outside the frame.
    """
    h, w = image.shape[0], image.shape[1]
    win = int(window)
    x0 = jnp.clip(jnp.round(center[0] - win / 2).astype(jnp.int32), 0, max(w - win, 0))
    y0 = jnp.clip(jnp.round(center[1] - win / 2).astype(jnp.int32), 0, max(h - win, 0))
    patch = jax.lax.dynamic_slice(image, (y0, x0, 0), (min(win, h), min(win, w), image.shape[2]))
    center_local = center - jnp.stack([x0, y0]).astype(center.dtype)
    return crop_and_resize_mxu(patch, center_local, scale, out_size, compute_dtype)


def batched_crop_and_resize(
    images: Array,
    centers: Array,
    scales: Array,
    rots: Array,
    out_size: tuple[int, int],
    method: str = "auto",
    compute_dtype=None,
) -> Array:
    """Batched crop+resize. ``method``:

    * 'gather' — general path, any rotation (`affine_warp`).
    * 'mxu' — separable matmul path, REQUIRES rot == 0 (values of
      ``rots`` are ignored); the inference/serving path.
    * 'auto' — 'mxu' when ``rots`` is a concrete all-zero array, else
      'gather'.
    """
    if method == "auto":
        try:
            is_zero = not isinstance(rots, jax.core.Tracer) and not bool(
                jnp.any(jnp.asarray(rots) != 0.0)
            )
        except jax.errors.TracerBoolConversionError:  # pragma: no cover
            is_zero = False
        method = "mxu" if is_zero else "gather"
    if method == "mxu":
        return jax.vmap(
            lambda im, c, s: crop_and_resize_mxu(im, c, s, out_size, compute_dtype)
        )(images, centers, scales)
    return jax.vmap(lambda im, c, s, r: crop_and_resize(im, c, s, r, out_size))(
        images, centers, scales, rots
    )
