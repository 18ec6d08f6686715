"""MViTv2: multiscale vision transformer detection backbone (TPU-native).

SURVEY §2.3 lists MViTv2 among the detectron2 projects family; the
vendored v0.6 tree predates it, so the semantic contract is the
published design (Li et al., "MViTv2: Improved Multiscale Vision
Transformers...", upstream detectron2 ``modeling/backbone/mvit.py``):

* 7x7 stride-4 conv patchify,
* 4 stages; the FIRST block of each later stage pools q 2x (spatial
  downsampling) and doubles the channel dim,
* pooled multi-head attention: q/k/v each pooled by a depthwise conv
  (+LayerNorm), with RESIDUAL POOLING (x = pooled_q + attn output) and
  decomposed relative position biases (shared helper with ViTDet),
* per-stage outputs at strides {4, 8, 16, 32} -> the standard
  ``{"res2".."res5"}`` dict consumed by models/fpn.FPN.

TPU-first: all pooling is depthwise conv (MXU/VPU friendly, static
shapes), attention is batched matmuls, windowing is unnecessary at the
spacecraft crop sizes (the stride-4 stage is the only large map and its
channel dim is small).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .vitdet import add_decomposed_rel_pos

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class MViTv2Config:
    embed_dim: int = 96
    depths: tuple[int, ...] = (2, 3, 16, 3)  # MViTv2-B
    num_heads: int = 1  # heads double per stage
    mlp_ratio: float = 4.0
    kv_stride: tuple[int, ...] = (4, 2, 1, 1)  # per-stage kv pooling
    use_rel_pos: bool = True
    residual_pooling: bool = True


MVITV2_TINY = MViTv2Config(embed_dim=16, depths=(1, 1, 1, 1), num_heads=1)


def _pool_map(x: Array, stride: int, conv: nn.Module | None) -> Array:
    """Depthwise-conv pool of a (B, H, W, C) map (mvit attention_pool)."""
    if conv is None:
        return x
    return conv(x)


class MultiScaleAttention(nn.Module):
    dim_out: int
    num_heads: int
    q_stride: int
    kv_stride: int
    use_rel_pos: bool
    residual_pooling: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, _ = x.shape
        hd = self.dim_out // self.num_heads
        qkv = nn.Dense(3 * self.dim_out, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, h, w, 3, self.num_heads, hd)
        # (3, b*heads, h, w, hd) maps for conv pooling
        qkv = qkv.transpose(3, 0, 4, 1, 2, 5).reshape(
            3, b * self.num_heads, h, w, hd
        )

        def pool(name, y, stride):
            k = 3 if stride > 1 else 3
            y = nn.Conv(
                hd, (k, k), strides=(stride, stride), padding="SAME",
                feature_group_count=hd, use_bias=False, dtype=self.dtype,
                name=f"pool_{name}",
            )(y)
            return nn.LayerNorm(dtype=self.dtype, name=f"norm_{name}")(y)

        q = pool("q", qkv[0], self.q_stride)
        k = pool("k", qkv[1], self.kv_stride)
        v = pool("v", qkv[2], self.kv_stride)
        qh, qw = q.shape[1], q.shape[2]
        kh, kw = k.shape[1], k.shape[2]

        qf = q.reshape(-1, qh * qw, hd)
        kf = k.reshape(-1, kh * kw, hd)
        vf = v.reshape(-1, kh * kw, hd)
        attn = (qf * (hd ** -0.5)) @ kf.transpose(0, 2, 1)
        if self.use_rel_pos:
            rel_h = self.param(
                "rel_pos_h", nn.initializers.zeros,
                (2 * max(qh, kh) - 1, hd),
            )
            rel_w = self.param(
                "rel_pos_w", nn.initializers.zeros,
                (2 * max(qw, kw) - 1, hd),
            )
            attn = add_decomposed_rel_pos(
                attn, qf.astype(jnp.float32), rel_h, rel_w, (qh, qw), (kh, kw)
            )
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = attn @ vf
        if self.residual_pooling:
            out = out + qf  # mvit.py residual pooling (v2 signature move)
        out = out.reshape(b, self.num_heads, qh * qw, hd)
        out = out.transpose(0, 2, 1, 3).reshape(b, qh, qw, self.dim_out)
        return nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(out)


class MultiScaleBlock(nn.Module):
    dim_out: int
    num_heads: int
    q_stride: int
    kv_stride: int
    mlp_ratio: float
    use_rel_pos: bool
    residual_pooling: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dim_in = x.shape[-1]
        x_norm = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        y = MultiScaleAttention(
            self.dim_out, self.num_heads, self.q_stride, self.kv_stride,
            self.use_rel_pos, self.residual_pooling, dtype=self.dtype,
            name="attn",
        )(x_norm)
        # upstream mvit.py projects the NORMED input on the shortcut
        # (``x = self.proj(x_norm)``), not the raw block input
        short = x
        if dim_in != self.dim_out:
            short = nn.Dense(self.dim_out, dtype=self.dtype,
                             name="shortcut_proj")(x_norm)
        if self.q_stride > 1:
            # mvit.py pool_skip: MaxPool2d(kernel=stride+1, stride,
            # padding=kernel//2, ceil_mode=False); flax pads max_pool
            # with -inf like torch
            k = self.q_stride + 1
            short = nn.max_pool(
                short, (k, k),
                strides=(self.q_stride, self.q_stride),
                padding=((k // 2, k // 2), (k // 2, k // 2)),
            )
        x = short + y
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim_out * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim_out, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class MViTv2Backbone(nn.Module):
    """4-stage pooled-attention trunk -> {"res2".."res5"}."""

    config: MViTv2Config = MVITV2_TINY
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> dict[str, Array]:
        cfg = self.config
        x = nn.Conv(
            cfg.embed_dim, (7, 7), strides=(4, 4), padding=(3, 3),
            dtype=self.dtype, name="patch_embed",
        )(x.astype(self.dtype))
        feats: dict[str, Array] = {}
        dim = cfg.embed_dim
        heads = cfg.num_heads
        for si, depth in enumerate(cfg.depths):
            for bi in range(depth):
                first = bi == 0 and si > 0
                dim_out = dim * 2 if first else dim
                x = MultiScaleBlock(
                    dim_out=dim_out,
                    num_heads=heads * 2 if first else heads,
                    q_stride=2 if first else 1,
                    kv_stride=cfg.kv_stride[si],
                    mlp_ratio=cfg.mlp_ratio,
                    use_rel_pos=cfg.use_rel_pos,
                    residual_pooling=cfg.residual_pooling,
                    dtype=self.dtype,
                    name=f"stage{si}_block{bi}",
                )(x)
                if first:
                    dim, heads = dim_out, heads * 2
            feats[f"res{si + 2}"] = nn.LayerNorm(
                dtype=self.dtype, name=f"norm_res{si + 2}"
            )(x)
        return feats
