"""ViTDet: plain-ViT detection backbone (TPU-native).

SURVEY §2.3 lists ViTDet among the detectron2 projects family; the
vendored v0.6 tree predates it, so the semantic contract here is the
published design (Li et al., "Exploring Plain Vision Transformer
Backbones for Object Detection", upstream detectron2
``modeling/backbone/vit.py`` / ``projects/ViTDet``):

* patchify with a stride-16 conv, absolute position embeddings,
* transformer blocks with WINDOWED attention except a few global
  blocks, decomposed relative position biases (Rh + Rw) added to the
  attention logits,
* a Simple Feature Pyramid built from the single stride-16 map:
  stride-4 (two stride-2 deconvs), stride-8 (one deconv), stride-16
  (identity), stride-32 (2x2 max-pool), each followed by 1x1 + 3x3
  convs with LayerNorm.

TPU-first: window partition is a pure reshape/transpose (static window
counts — inputs are padded to window multiples), attention is batched
MXU matmuls in bf16-friendly shapes, and the backbone returns the same
``{"res2".."res5"}`` dict as ``ResNetBackbone`` so it drops into the
existing FPN/RPN/ROI stack unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ViTDetConfig:
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    window_size: int = 14
    # blocks with global attention (upstream ViTDet-B: every 3rd)
    global_blocks: tuple[int, ...] = (2, 5, 8, 11)
    use_rel_pos: bool = True
    out_channels: int = 256
    # pretrain grid side used to size the abs pos table (224/16)
    pretrain_grid: int = 14


VITDET_TINY = ViTDetConfig(
    embed_dim=32, depth=2, num_heads=2, window_size=4, global_blocks=(1,),
    out_channels=16, pretrain_grid=4,
)


def window_partition(x: Array, win: int) -> tuple[Array, tuple[int, int]]:
    """(B, H, W, C) -> (B*nh*nw, win, win, C) with zero padding to the
    next window multiple. Pure reshape/transpose — no gathers."""
    b, h, w, c = x.shape
    ph = (-h) % win
    pw = (-w) % win
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // win, win, wp // win, win, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win, win, c)
    return x, (hp, wp)


def window_unpartition(
    x: Array, win: int, padded_hw: tuple[int, int], out_hw: tuple[int, int]
) -> Array:
    hp, wp = padded_hw
    h, w = out_hw
    b = x.shape[0] // ((hp // win) * (wp // win))
    x = x.reshape(b, hp // win, wp // win, win, win, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def _cubic_weights(t: Array, a: float = -0.75):
    """4-tap cubic-convolution weights at fractional offset ``t`` for
    taps (-1, 0, +1, +2) — torch's upsample_bicubic2d kernel (A=-0.75;
    jax.image.resize 'bicubic' uses the Keys A=-0.5 filter instead)."""

    def cc1(x):  # |x| <= 1
        return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0

    def cc2(x):  # 1 < |x| < 2
        return ((a * x - 5.0 * a) * x + 8.0 * a) * x - 4.0 * a

    return cc2(t + 1.0), cc1(t), cc1(1.0 - t), cc2(2.0 - t)


def interpolate_bicubic(x: Array, out_hw: tuple[int, int], a: float = -0.75) -> Array:
    """torch ``F.interpolate(size=out_hw, mode='bicubic',
    align_corners=False)`` on (N, H, W, C): separable 4-tap cubic at
    half-pixel centers, per-tap edge clamping (upsample_get_value_bounded),
    source coordinate NOT pre-clamped (cubic branch of
    area_pixel_compute_source_index)."""
    n, h, w, c = x.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])

    def axis_taps(size, out):
        src = (jnp.arange(out, dtype=jnp.float32) + 0.5) * (size / out) - 0.5
        i0 = jnp.floor(src)
        t = src - i0
        ws = _cubic_weights(t, a)
        idx = [jnp.clip(i0.astype(jnp.int32) + k, 0, size - 1) for k in (-1, 0, 1, 2)]
        return idx, ws

    yi, yw = axis_taps(h, oh)
    rows = sum(x[:, yi[k]] * yw[k][None, :, None, None] for k in range(4))
    xi, xw = axis_taps(w, ow)
    return sum(rows[:, :, xi[k]] * xw[k][None, None, :, None] for k in range(4))


def get_rel_pos(q_size: int, k_size: int, rel_pos: Array) -> Array:
    """Slice/interpolate the (2*max-1, head_dim) table to the
    (q_size, k_size) relative-distance matrix (vit.py get_rel_pos
    semantics; equal q/k sizes here so no rescaling branch)."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        # vit.py uses F.interpolate(mode='linear') — torch semantics (no
        # antialias on shrink), via the shared 2-tap resampler
        from .point_rend import interpolate_bilinear

        rel_pos = interpolate_bilinear(
            rel_pos[None, :, None, :], (max_rel_dist, 1)
        )[0, :, 0, :]
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


def add_decomposed_rel_pos(
    attn: Array, q: Array, rel_h: Array, rel_w: Array,
    q_hw: tuple[int, int], k_hw: tuple[int, int],
) -> Array:
    """attn (B, qh*qw, kh*kw) += einsum decomposed Rh/Rw biases
    (vit.py add_decomposed_rel_pos)."""
    qh, qw = q_hw
    kh, kw = k_hw
    rh = get_rel_pos(qh, kh, rel_h)  # (qh, kh, d)
    rw = get_rel_pos(qw, kw, rel_w)  # (qw, kw, d)
    b = q.shape[0]
    rq = q.reshape(b, qh, qw, -1)
    bias_h = jnp.einsum("bhwc,hkc->bhwk", rq, rh)
    bias_w = jnp.einsum("bhwc,wkc->bhwk", rq, rw)
    attn = attn.reshape(b, qh, qw, kh, kw)
    attn = attn + bias_h[:, :, :, :, None] + bias_w[:, :, :, None, :]
    return attn.reshape(b, qh * qw, kh * kw)


class Attention(nn.Module):
    """Multi-head attention over a (B, H, W, C) map, with optional
    decomposed relative position biases."""

    num_heads: int
    use_rel_pos: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        hd = c // self.num_heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, hd)
        qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(3, b * self.num_heads, h * w, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * (hd ** -0.5)) @ k.transpose(0, 2, 1)
        if self.use_rel_pos:
            rel_h = self.param(
                "rel_pos_h", nn.initializers.zeros, (2 * h - 1, hd)
            )
            rel_w = self.param(
                "rel_pos_w", nn.initializers.zeros, (2 * w - 1, hd)
            )
            attn = add_decomposed_rel_pos(
                attn, q.astype(jnp.float32), rel_h, rel_w, (h, w), (h, w)
            )
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = (attn @ v).reshape(b, self.num_heads, h * w, hd)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class Block(nn.Module):
    config: ViTDetConfig
    window: int  # 0 = global
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.config
        shortcut = x
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        if self.window > 0:
            hw = y.shape[1], y.shape[2]
            y, padded = window_partition(y, self.window)
            y = Attention(
                cfg.num_heads, cfg.use_rel_pos, dtype=self.dtype, name="attn"
            )(y)
            y = window_unpartition(y, self.window, padded, hw)
        else:
            y = Attention(
                cfg.num_heads, cfg.use_rel_pos, dtype=self.dtype, name="attn"
            )(y)
        x = shortcut + y
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(cfg.embed_dim * cfg.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(cfg.embed_dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class ViTDetBackbone(nn.Module):
    """ViT trunk + Simple Feature Pyramid -> {"res2".."res5"} feature
    dict (drop-in for ResNetBackbone ahead of models/fpn.FPN)."""

    config: ViTDetConfig = VITDET_TINY
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> dict[str, Array]:
        cfg = self.config
        p = cfg.patch_size
        x = nn.Conv(
            cfg.embed_dim, (p, p), strides=(p, p), padding="VALID",
            dtype=self.dtype, name="patch_embed",
        )(x.astype(self.dtype))
        b, h, w, c = x.shape
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, cfg.pretrain_grid, cfg.pretrain_grid, cfg.embed_dim),
        )
        if (cfg.pretrain_grid, cfg.pretrain_grid) != (h, w):
            # torch bicubic (A=-0.75), matching get_abs_pos's
            # F.interpolate — NOT jax.image.resize's Keys A=-0.5 filter
            pos = interpolate_bicubic(pos, (h, w))
        x = x + pos.astype(x.dtype)
        for i in range(cfg.depth):
            win = 0 if i in cfg.global_blocks else cfg.window_size
            x = Block(cfg, win, dtype=self.dtype, name=f"block{i}")(x)

        # Simple Feature Pyramid (projects/ViTDet SimpleFeaturePyramid):
        # scale factors {4.0, 2.0, 1.0, 0.5} off the stride-16 map
        def out_convs(y, name):
            y = nn.Conv(cfg.out_channels, (1, 1), use_bias=False,
                        dtype=self.dtype, name=f"{name}_lateral")(y)
            y = nn.LayerNorm(dtype=self.dtype, name=f"{name}_ln1")(y)
            y = nn.Conv(cfg.out_channels, (3, 3), padding="SAME",
                        use_bias=False, dtype=self.dtype,
                        name=f"{name}_output")(y)
            return nn.LayerNorm(dtype=self.dtype, name=f"{name}_ln2")(y)

        up2 = nn.ConvTranspose(c // 2, (2, 2), strides=(2, 2),
                               dtype=self.dtype, name="up_res3")(x)
        up4 = nn.ConvTranspose(c // 2, (2, 2), strides=(2, 2),
                               dtype=self.dtype, name="up_res2a")(x)
        up4 = nn.gelu(nn.LayerNorm(dtype=self.dtype, name="up_res2_ln")(up4))
        up4 = nn.ConvTranspose(c // 4, (2, 2), strides=(2, 2),
                               dtype=self.dtype, name="up_res2b")(up4)
        down2 = nn.max_pool(x, (2, 2), strides=(2, 2))
        return {
            "res2": out_convs(up4, "res2"),
            "res3": out_convs(up2, "res3"),
            "res4": out_convs(x, "res4"),
            "res5": out_convs(down2, "res5"),
        }
