"""RegNet backbone (detectron2 modeling/backbone/regnet.py parity).

Compact RegNetX implementation: simple stem + 4 stages of residual
bottleneck X-blocks (1x1 -> grouped 3x3 stride-s -> 1x1, SE optional for
RegNetY). Stage widths/depths follow the generated-design parameters of
the published models; two presets (RegNetX-400MF-ish and a tiny test
config) are provided, and arbitrary (depths, widths, group_width) specs
are accepted.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .resnet_backbone import ConvFrozenBN

Dtype = Any


@dataclasses.dataclass(frozen=True)
class RegNetConfig:
    depths: tuple[int, ...] = (1, 2, 7, 12)  # RegNetX-400MF
    widths: tuple[int, ...] = (32, 64, 160, 384)
    group_width: int = 16
    stem_width: int = 32
    se_ratio: float = 0.0  # >0 -> RegNetY squeeze-excite
    out_features: tuple[str, ...] = ("s1", "s2", "s3", "s4")


REGNETX_400MF = RegNetConfig()
REGNETY_400MF = RegNetConfig(
    depths=(1, 3, 6, 6), widths=(48, 104, 208, 440), group_width=8, se_ratio=0.25
)
REGNET_TINY = RegNetConfig(depths=(1, 1, 1, 1), widths=(8, 16, 32, 64), group_width=8,
                           stem_width=8)


class SqueezeExcite(nn.Module):
    ratio: float
    base_width: int | None = None  # d2/pycls: w_se = round(w_in * se_r)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        base = self.base_width if self.base_width is not None else c
        # d2 regnet.py SE width is computed from the BLOCK INPUT width
        # (w_in), not the SE input's own width — published RegNetY
        # checkpoints have these fc shapes
        mid = max(int(round(base * self.ratio)), 1)
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.relu(nn.Conv(mid, (1, 1), dtype=self.dtype, name="fc1")(s))
        s = nn.sigmoid(nn.Conv(c, (1, 1), dtype=self.dtype, name="fc2")(s))
        return x * s


class XBlock(nn.Module):
    width: int
    stride: int
    group_width: int
    se_ratio: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        groups = max(self.width // self.group_width, 1)
        w_in = x.shape[-1]
        out = ConvFrozenBN(self.width, 1, 1, dtype=self.dtype, name="a")(x)
        out = ConvFrozenBN(self.width, 3, self.stride, groups=groups, dtype=self.dtype, name="b")(out)
        if self.se_ratio > 0:
            out = SqueezeExcite(
                self.se_ratio, base_width=w_in, dtype=self.dtype, name="se"
            )(out)
        out = ConvFrozenBN(self.width, 1, 1, act=False, dtype=self.dtype, name="c")(out)
        if self.stride != 1 or x.shape[-1] != self.width:
            shortcut = ConvFrozenBN(
                self.width, 1, self.stride, act=False, dtype=self.dtype, name="proj"
            )(x)
        else:
            shortcut = x
        return nn.relu(out + shortcut)


class RegNet(nn.Module):
    config: RegNetConfig = REGNETX_400MF
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = x.astype(self.dtype)
        x = ConvFrozenBN(cfg.stem_width, 3, 2, dtype=self.dtype, name="stem")(x)
        feats = {}
        for si, (d, w) in enumerate(zip(cfg.depths, cfg.widths)):
            for bi in range(d):
                x = XBlock(
                    w, 2 if bi == 0 else 1, cfg.group_width, cfg.se_ratio,
                    dtype=self.dtype, name=f"s{si + 1}_b{bi}",
                )(x)
            feats[f"s{si + 1}"] = x
        return {k: feats[k] for k in cfg.out_features}
