"""Device-side visual augmentations (the fork's event/SPEED+ family).

JAX re-implementations of the reference's two parallel augmentation
stacks — the detectron2-fork Augmentations
(object_detection/detectron2/detectron2/data/transforms/
augmentation_impl.py:639-1120: RandomEventNoise, FillBlack,
RandomEventLines, RandomNoise, RandomStars, RandomHaze, RandomFlares,
RandomStreaks, RandomBloom, RandomErasing) and the HRNet-side numpy
transforms (lib/utils/transforms.py:131-484).

All functions take ``(key, image)`` with image float32 in [0, 255]
(HWC, RGB) and are jit/vmap-safe: random *parameters* match the
reference's distributions; pixel-exact parity with numpy RNG is not a
goal. PIL GaussianBlur radii are mapped to gaussian sigma with a static
max kernel support.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.warp import affine_warp

Array = jax.Array


# ---------------------------------------------------------------------------
# Helpers
# ---------------------------------------------------------------------------


def gaussian_blur(img: Array, sigma, kernel_size: int, trunc_ksize=None) -> Array:
    """Separable gaussian blur with traced sigma, static support.

    ``trunc_ksize`` (traced): zero the taps beyond (trunc_ksize-1)/2 —
    cv2.GaussianBlur's ksize truncation with a DYNAMIC ksize under a
    static max support (kernel_size)."""
    r = kernel_size // 2
    x = jnp.arange(-r, r + 1, dtype=jnp.float32)
    w = jnp.exp(-0.5 * (x / jnp.maximum(sigma, 1e-3)) ** 2)
    if trunc_ksize is not None:
        w = w * (jnp.abs(x) <= (trunc_ksize - 1) / 2)
    w = w / jnp.sum(w)
    # blur H axis then W axis via correlation
    def conv1d(im, axis):
        moved = jnp.moveaxis(im, axis, 0)
        padded = jnp.pad(moved, ((r, r), (0, 0), (0, 0)), mode="edge")
        idx = jnp.arange(moved.shape[0])[:, None] + jnp.arange(kernel_size)[None, :]
        gathered = padded[idx]  # (H, K, W, C)
        out = jnp.einsum("hkwc,k->hwc", gathered, w)
        return jnp.moveaxis(out, 0, axis)

    return conv1d(conv1d(img, 0), 1)


def box_blur(img: Array, kernel_size: int, trunc_ksize=None) -> Array:
    """``trunc_ksize`` (traced): dynamic box width under a static max
    support, matching cv2.blur with a runtime-random ksize."""
    if trunc_ksize is None:
        k = jnp.ones(kernel_size, jnp.float32) / kernel_size
    else:
        r0 = kernel_size // 2
        x = jnp.arange(-r0, r0 + 1, dtype=jnp.float32)
        inside = (jnp.abs(x) <= (trunc_ksize - 1) / 2).astype(jnp.float32)
        k = inside / jnp.sum(inside)
    r = kernel_size // 2

    def conv1d(im, axis):
        moved = jnp.moveaxis(im, axis, 0)
        padded = jnp.pad(moved, ((r, r), (0, 0), (0, 0)), mode="edge")
        idx = jnp.arange(moved.shape[0])[:, None] + jnp.arange(kernel_size)[None, :]
        out = jnp.einsum("hkwc,k->hwc", padded[idx], k)
        return jnp.moveaxis(out, 0, axis)

    return conv1d(conv1d(img, 0), 1)


def _warp_matrix(img: Array, M: Array) -> Array:
    """Warp with forward 3x3/2x3 matrix (src->dst); zero border."""
    A = M[:2, :2]
    b = M[:2, 2]
    A_inv = jnp.linalg.inv(A)
    M_inv = jnp.concatenate([A_inv, (-A_inv @ b)[:, None]], axis=1)
    return affine_warp(img, M_inv, (img.shape[1], img.shape[0]))


def scale_warp(img: Array, sx, sy) -> Array:
    M = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    M = M.at[0, 0].set(sx).at[1, 1].set(sy)
    return _warp_matrix(img, M)


def shear_warp(img: Array, shear) -> Array:
    M = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    M = M.at[0, 1].set(shear)
    return _warp_matrix(img, M)


def rotate_about_center(img: Array, angle_deg) -> Array:
    h, w = img.shape[0], img.shape[1]
    t = jnp.deg2rad(angle_deg)
    cs, sn = jnp.cos(t), jnp.sin(t)
    cx, cy = w / 2.0, h / 2.0
    # cv2.getRotationMatrix2D convention (CCW for positive angle)
    A = jnp.stack([jnp.stack([cs, sn]), jnp.stack([-sn, cs])])
    b = jnp.stack([(1 - cs) * cx - sn * cy, sn * cx + (1 - cs) * cy])
    M = jnp.concatenate([A, b[:, None]], axis=1)
    M3 = jnp.concatenate([M, jnp.array([[0.0, 0.0, 1.0]])], axis=0)
    return _warp_matrix(img, M3)


def blend(img: Array, src: Array, src_weight, dst_weight=1.0) -> Array:
    return jnp.clip(src_weight * src + dst_weight * img, 0.0, 255.0)


# ---------------------------------------------------------------------------
# Event-domain augmentations
# ---------------------------------------------------------------------------


def event_noise(key: Array, img: Array, apply_prob: float = 0.7) -> Array:
    """Salt noise: a U(0.001, 0.05) fraction of pixels -> white."""
    k1, k2, k3 = jax.random.split(key, 3)
    t = jax.random.uniform(k1, (), minval=0.001, maxval=0.05)
    mask = jax.random.uniform(k2, img.shape[:2]) < t
    noised = jnp.where(mask[..., None], 255.0, img)
    return jnp.where(jax.random.uniform(k3) < apply_prob, noised, img)


def fill_black(img: Array) -> Array:
    """Near-black pixels (all channels <= 100) -> mid grey 127."""
    black = jnp.all(img <= 100.0, axis=-1, keepdims=True)
    return jnp.where(black, 127.0, img)


def event_lines(
    key: Array, img: Array, x_jitter: float = 5.0, max_points: int = 2048
) -> Array:
    """Up to 3 noisy white streak lines (transforms.py:158-211)."""
    h, w = img.shape[0], img.shape[1]

    def one_line(k, im):
        ks = jax.random.split(k, 6)
        skip = jax.random.uniform(ks[0]) < 0.3
        x_shift = jax.random.uniform(ks[1], (), minval=-200.0, maxval=200.0)
        x1 = jax.random.uniform(ks[2], (), minval=x_shift, maxval=w - x_shift)
        x2 = x1 + x_shift
        m = (h - 0.0) / jnp.where(jnp.abs(x_shift) > 1e-3, x_shift, 1e-3)
        density = jax.random.randint(ks[3], (), 100, 10000)
        tt = jnp.linspace(0.0, 1.0, max_points)
        xs = x1 + tt * x_shift
        ys = m * (xs - x1)
        xs = xs + jax.random.uniform(ks[4], (max_points,), minval=-x_jitter, maxval=x_jitter)
        ys = ys + jax.random.uniform(
            ks[5], (max_points,), minval=-100 + x_shift / 2, maxval=100 - x_shift / 2
        )
        # reference: X = linspace(x1, x2, density) — the line ALWAYS
        # spans the full height; density is the DOT COUNT along it.
        # Static-shape equivalent: activate min(density, max_points)
        # evenly spaced samples of the full-span grid.
        idx = jnp.arange(max_points)
        marks = jnp.floor(idx * (density / max_points))
        active = jnp.concatenate(
            [jnp.ones((1,), bool), marks[1:] != marks[:-1]]
        ) | (density >= max_points)
        xi = jnp.clip(jnp.floor(xs), 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(jnp.floor(ys), 0, h - 1).astype(jnp.int32)
        white = jnp.where(active[:, None], 255.0, 0.0)
        drawn = im.at[yi, xi].max(jnp.broadcast_to(white, (max_points, im.shape[-1])))
        return jnp.where(skip, im, drawn)

    k0, *lks = jax.random.split(key, 4)
    out = img
    for lk in lks:
        out = one_line(lk, out)
    return jnp.where(jax.random.uniform(k0) < 0.3, img, out)


def random_stars(key: Array, img: Array) -> Array:
    """Thresholded blurred gaussian noise -> star field overlay."""
    ks = jax.random.split(key, 4)
    h, w = img.shape[0], img.shape[1]
    std = jax.random.uniform(ks[0], (), minval=0.03, maxval=0.05)
    mean = jax.random.uniform(ks[1], (), minval=0.05, maxval=0.15)
    noise = jax.random.normal(ks[2], (h, w, 1))
    noise = jnp.broadcast_to(noise, img.shape)
    noise = (255.0 * std) * (255.0 * noise) + 255.0 * mean
    noise = jnp.clip(noise, 0.0, 255.0)
    noise = gaussian_blur(noise, 3.5, 21)
    noise = jnp.where(noise < 160.0, 0.0, noise)
    sigma2 = jax.random.uniform(ks[3], (), minval=1.5, maxval=2.0)
    noise = gaussian_blur(noise, sigma2, 13)
    apply = jax.random.randint(jax.random.fold_in(key, 7), (), 0, 2) == 1
    return jnp.where(apply, blend(img, noise, 1.0), img)


def random_haze(key: Array, img: Array) -> Array:
    """Blurred thresholded noise cloud blended over the frame.

    Keeps the reference's fixed 1.5/1.8 anisotropic stretch quirk
    (transforms.py:236-240 `_scale_image` ignores its s_x/s_y args).
    """
    ks = jax.random.split(key, 5)
    h, w = img.shape[0], img.shape[1]
    std = jax.random.uniform(ks[0], (), minval=0.03, maxval=0.05)
    mean = jax.random.uniform(ks[1], (), minval=0.05, maxval=0.15)
    noise = jnp.broadcast_to(jax.random.normal(ks[2], (h, w, 1)), img.shape)
    noise = jnp.clip((255.0 * std) * (255.0 * noise) + 255.0 * mean, 0.0, 255.0)
    noise = gaussian_blur(noise, 5.0, 31)
    thresh = jax.random.randint(ks[3], (), 125, 140).astype(jnp.float32)
    noise = jnp.where(noise < thresh, 0.0, noise)
    noise = scale_warp(noise, 1.5, 1.8)
    sigma = jax.random.uniform(ks[4], (), minval=25.0, maxval=40.0)
    noise = gaussian_blur(noise, sigma, 121)
    wgt = jax.random.uniform(jax.random.fold_in(key, 9), (), minval=0.1, maxval=0.8)
    return blend(img, noise, wgt)


def _hexagon_mask(h: int, w: int, cx, cy, radius) -> Array:
    """Filled regular hexagon via half-plane intersection."""
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx
    angles = jnp.arange(6) * (jnp.pi / 3.0)
    nx = jnp.cos(angles)
    ny = jnp.sin(angles)
    # inside iff projection onto each edge normal <= apothem
    proj = xs[None] * nx[:, None, None] + ys[None] * ny[:, None, None]
    return jnp.all(proj <= radius * jnp.cos(jnp.pi / 6.0), axis=0)


def random_flares(key: Array, img: Array, max_flares: int = 9) -> Array:
    """1-9 white polygon flares, rotated/sheared/blurred then blended."""
    h, w = img.shape[0], img.shape[1]
    ks = jax.random.split(key, 2)
    n = jax.random.randint(ks[0], (), 1, max_flares + 1)

    def body(i, canvas):
        k = jax.random.fold_in(ks[1], i)
        kk = jax.random.split(k, 6)
        cx = jax.random.randint(kk[0], (), w // 2 - 500, w // 2 + 500).astype(jnp.float32)
        cy = jax.random.randint(kk[1], (), h // 2 - 400, h // 2 + 400).astype(jnp.float32)
        radius = jax.random.randint(kk[2], (), 5, 100).astype(jnp.float32)
        poly = _hexagon_mask(h, w, cx, cy, radius)
        canvas = jnp.where(poly[..., None], 255.0, canvas)
        canvas = rotate_about_center(canvas, jax.random.randint(kk[3], (), 0, 180).astype(jnp.float32))
        canvas = shear_warp(canvas, jax.random.uniform(kk[4], (), minval=0.0, maxval=0.75))
        sigma = jax.random.uniform(kk[5], (), minval=1.0, maxval=5.0)
        canvas = gaussian_blur(canvas, sigma, 31)
        canvas = canvas * jax.random.uniform(jax.random.fold_in(k, 11), (), minval=0.4, maxval=1.2)
        return canvas

    def loop(i, canvas):
        return jax.lax.cond(i < n, lambda c: body(i, c), lambda c: c, canvas)

    canvas = jax.lax.fori_loop(0, max_flares, loop, jnp.zeros_like(img))
    wgt = jax.random.uniform(jax.random.fold_in(key, 13), (), minval=0.0, maxval=1.0)
    return blend(img, canvas, wgt)


def radial_blur(img: Array, amount, cx, cy, iterations: int = 5) -> Array:
    """Iterative grow/shrink remap radial blur (transforms.py:367-382)."""
    h, w = img.shape[0], img.shape[1]
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)

    def sample(im, sx, sy):
        x0 = jnp.floor(sx).astype(jnp.int32)
        y0 = jnp.floor(sy).astype(jnp.int32)
        fx = (sx - x0)[..., None]
        fy = (sy - y0)[..., None]
        x0c = jnp.clip(x0, 0, w - 1)
        y0c = jnp.clip(y0, 0, h - 1)
        x1c = jnp.clip(x0 + 1, 0, w - 1)
        y1c = jnp.clip(y0 + 1, 0, h - 1)
        inb = ((sx >= 0) & (sx < w) & (sy >= 0) & (sy < h))[..., None]
        v = (
            im[y0c, x0c] * (1 - fx) * (1 - fy)
            + im[y0c, x1c] * fx * (1 - fy)
            + im[y1c, x0c] * (1 - fx) * fy
            + im[y1c, x1c] * fx * fy
        )
        return v * inb

    gx = jnp.abs(xs + (xs - cx) * amount)
    sx_ = jnp.abs(xs - (xs - cx) * amount)
    gy = jnp.abs(ys + (ys - cy) * amount)
    sy_ = jnp.abs(ys - (ys - cy) * amount)

    def body(_, im):
        return 0.5 * sample(im, gx, gy) + 0.5 * sample(im, sx_, sy_)

    return jax.lax.fori_loop(0, iterations, body, img)


def radial_fade(img: Array) -> Array:
    h, w = img.shape[0], img.shape[1]
    ys = jnp.linspace(-1.0, 1.0, h)[:, None] * 255.0
    xs = jnp.linspace(-1.0, 1.0, w)[None, :] * 255.0
    alpha = 255.0 - jnp.clip(jnp.sqrt(ys**2 + xs**2), 0.0, 255.0)
    return img * (alpha[..., None] / 255.0)


def random_streaks(key: Array, img: Array) -> Array:
    """Radial-blurred noise streaks (transforms.py:320-422)."""
    h, w = img.shape[0], img.shape[1]
    ks = jax.random.split(key, 8)
    std = jax.random.uniform(ks[0], (), minval=0.03, maxval=0.05)
    mean = jax.random.uniform(ks[1], (), minval=0.05, maxval=0.15)
    noise = jnp.broadcast_to(jax.random.normal(ks[2], (h, w, 1)), img.shape)
    noise = jnp.clip((255.0 * std) * (255.0 * noise) + 255.0 * mean, 0.0, 255.0)
    noise = gaussian_blur(noise, 1.0, 7)
    thresh = jax.random.randint(ks[3], (), 150, 200).astype(jnp.float32)
    noise = jnp.where(noise < thresh, 0.0, noise)
    amount = jax.random.uniform(ks[4], (), minval=0.01, maxval=0.04)
    cx = jax.random.randint(ks[5], (), 0, w).astype(jnp.float32)
    cy = jax.random.randint(ks[6], (), 0, h).astype(jnp.float32)
    noise = radial_blur(noise, amount, cx, cy)
    noise = radial_fade(noise)
    kdir, kscale, krot, kw = jax.random.split(ks[7], 4)
    s = jax.random.uniform(kscale, (), minval=2.0, maxval=4.0)
    noise = jax.lax.cond(
        jax.random.randint(kdir, (), 0, 2) == 1,
        lambda nz: scale_warp(nz, s, 1.0),
        lambda nz: scale_warp(nz, 1.0, s),
        noise,
    )
    # reference quirk: rotation angle drawn from U(0, pi) *degrees*
    noise = rotate_about_center(noise, jax.random.uniform(krot, (), minval=0.0, maxval=jnp.pi))
    wgt = jax.random.uniform(kw, (), minval=0.0, maxval=1.0)
    return blend(img, noise, wgt)


def random_bloom(key: Array, img: Array) -> Array:
    """Additive glow (transforms.py:424-450): cv2.GaussianBlur with
    FIXED sigma=10 and a varying truncation ksize 19..109, then a
    varying 15..105 box blur (the box dominates the glow at large
    offsets). Static max supports with dynamic tap masks."""
    k1 = jax.random.fold_in(key, 0)
    offset = jax.random.randint(k1, (), 10, 100)
    offset = offset + (offset % 2)  # reference odd->even adjustment
    bloom = gaussian_blur(img, 10.0, 109, trunc_ksize=9 + offset)
    bloom = box_blur(bloom, 105, trunc_ksize=5 + offset)
    return blend(img, bloom, 1.0)


def random_noise_01(
    key: Array, img01: Array,
    std_range: tuple[float, float] = (0.03, 0.05),
    mean_range: tuple[float, float] = (0.05, 0.15),
) -> Array:
    """Tensor-space gaussian noise (transforms.py RandomNoise, [0,1]).
    The DA drivers pass the reference's per-domain ranges
    (train_da_ms.py:150,160: lightbox mean 0.03-0.25/std 0.01-0.1,
    sunlamp mean 0.01-0.1/std 0.03-0.05)."""
    k1, k2, k3 = jax.random.split(key, 3)
    std = jax.random.uniform(k1, (), minval=std_range[0], maxval=std_range[1])
    mean = jax.random.uniform(k2, (), minval=mean_range[0], maxval=mean_range[1])
    noise = jnp.broadcast_to(
        jax.random.normal(k3, (*img01.shape[:2], 1)), img01.shape
    )
    return jnp.clip(std * noise + mean + img01, 0.0, 1.0)


def random_erasing(key: Array, img: Array, min_frac=0.05, max_frac=0.3) -> Array:
    """Erase a random rectangle to zero."""
    h, w = img.shape[0], img.shape[1]
    ks = jax.random.split(key, 4)
    eh = (jax.random.uniform(ks[0], (), minval=min_frac, maxval=max_frac) * h).astype(jnp.int32)
    ew = (jax.random.uniform(ks[1], (), minval=min_frac, maxval=max_frac) * w).astype(jnp.int32)
    y0 = jax.random.randint(ks[2], (), 0, h)
    x0 = jax.random.randint(ks[3], (), 0, w)
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inside = (ys >= y0) & (ys < y0 + eh) & (xs >= x0) & (xs < x0 + ew)
    return jnp.where(inside[..., None], 0.0, img)


def color_jitter(
    key: Array,
    img: Array,
    brightness: float = 0.4,
    contrast: float = 0.4,
    saturation: float = 0.4,
) -> Array:
    """torchvision ColorJitter equivalent (the train_rgb.py variant's
    extra aug): random brightness/contrast/saturation factors applied in
    random order is approximated by a fixed order (b, c, s)."""
    kb, kc, ks = jax.random.split(key, 3)
    b = jax.random.uniform(kb, (), minval=1 - brightness, maxval=1 + brightness)
    c = jax.random.uniform(kc, (), minval=1 - contrast, maxval=1 + contrast)
    s = jax.random.uniform(ks, (), minval=1 - saturation, maxval=1 + saturation)
    img = img * b
    mean = jnp.mean(img, axis=(0, 1, 2), keepdims=True)
    img = (img - mean) * c + mean
    grey = jnp.mean(img, axis=-1, keepdims=True)
    img = (img - grey) * s + grey
    return jnp.clip(img, 0.0, 255.0)


# ---------------------------------------------------------------------------
# Stacks (per-domain pipelines, train_da_ms.py:145-166 equivalents)
# ---------------------------------------------------------------------------

EVENT_STACK = ("event_noise", "event_lines")
SPEEDPLUS_STACK = ("random_haze", "random_flares", "random_streaks", "random_bloom", "random_stars")

_REGISTRY = {
    "event_noise": event_noise,
    "event_lines": event_lines,
    "fill_black": lambda key, img: fill_black(img),
    "random_stars": random_stars,
    "random_haze": random_haze,
    "random_flares": random_flares,
    "random_streaks": random_streaks,
    "random_bloom": random_bloom,
    "random_erasing": random_erasing,
}


def apply_stack(key: Array, img: Array, names=EVENT_STACK) -> Array:
    for i, name in enumerate(names):
        img = _REGISTRY[name](jax.random.fold_in(key, i), img)
    return img
