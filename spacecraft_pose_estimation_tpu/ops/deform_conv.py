"""Deformable convolution v1/v2 as XLA bilinear gathers.

Replacement for detectron2's deform_conv CUDA kernels
(layers/csrc/deformable, wrapped by layers/deform_conv.py): sampling
locations are the regular k x k grid plus learned per-location offsets;
v2 ("modulated") adds a per-sample sigmoid mask. Used by
DeformBottleneckBlock / DCN backbone variants (optional for the
reference's X101 preset, which doesn't enable DCN).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def _bilinear_hw(feat: Array, y: Array, x: Array) -> Array:
    """Sample feat (H, W, C) at continuous grids y/x (...,) -> (..., C)."""
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
    out = (
        feat[y0, x0] * (1 - fy) * (1 - fx)
        + feat[y0, x1] * (1 - fy) * fx
        + feat[y1, x0] * fy * (1 - fx)
        + feat[y1, x1] * fy * fx
    )
    return out * inb[..., None]


def deform_conv2d(
    x: Array,  # (H, W, Cin)
    offsets: Array,  # (H, W, 2*K*K) [dy, dx] per tap
    kernel: Array,  # (K, K, Cin, Cout)
    mask: Array | None = None,  # (H, W, K*K) modulation (v2)
    stride: int = 1,
) -> Array:
    """Single-image deformable conv, 'SAME'-style padding semantics."""
    kh, kw, cin, cout = kernel.shape
    h, w = x.shape[0], x.shape[1]
    oh, ow = h // stride, w // stride
    base_y = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 0) * stride
    base_x = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 1) * stride

    cols = []
    for i in range(kh):
        for j in range(kw):
            t = i * kw + j
            dy = offsets[::stride, ::stride, 2 * t]
            dx = offsets[::stride, ::stride, 2 * t + 1]
            yy = base_y + (i - kh // 2) + dy
            xx = base_x + (j - kw // 2) + dx
            v = _bilinear_hw(x, yy, xx)  # (oh, ow, Cin)
            if mask is not None:
                v = v * mask[::stride, ::stride, t : t + 1]
            cols.append(v)
    sampled = jnp.stack(cols, axis=2)  # (oh, ow, K*K, Cin)
    wmat = kernel.reshape(kh * kw, cin, cout)
    return jnp.einsum("hwkc,kco->hwo", sampled, wmat)


class DeformConv(nn.Module):
    """Learned-offset deformable conv layer (v2 when modulated=True)."""

    features: int
    kernel: int = 3
    stride: int = 1
    modulated: bool = True

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        k2 = self.kernel * self.kernel
        off = nn.Conv(
            2 * k2 + (k2 if self.modulated else 0),
            (self.kernel, self.kernel),
            strides=(1, 1),
            padding=self.kernel // 2,
            kernel_init=nn.initializers.zeros,  # start as regular conv
            name="offset_conv",
        )(x)
        kernel = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (self.kernel, self.kernel, x.shape[-1], self.features),
        )

        def one(img, offm):
            offsets = offm[..., : 2 * k2]
            mask = (
                jax.nn.sigmoid(offm[..., 2 * k2 :]) * 2.0 if self.modulated else None
            )
            return deform_conv2d(img, offsets, kernel, mask, self.stride)

        return jax.vmap(one)(x, off)
