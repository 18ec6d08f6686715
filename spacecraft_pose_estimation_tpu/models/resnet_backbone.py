"""Detection backbones: ResNet / ResNeXt with frozen-BN, multi-scale outputs.

Equivalent of detectron2's resnet builder (modeling/backbone/resnet.py:
100-614): 7x7 stem + res2..res5 bottleneck stages, `groups`/
`width_per_group` for ResNeXt (X101-32x8d is the reference's flagship,
object_detection_utils.py config_4), FrozenBatchNorm semantics (the zoo
default — BN folded into a fixed affine, layers/batch_norm.py:13-150),
and `freeze_at` to stop gradients through early stages.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class FrozenBN(nn.Module):
    """Fixed affine y = scale * x + bias from frozen BN statistics.

    Parameters live in the `params` collection but receive zero gradient
    via stop_gradient — functionally identical to FrozenBatchNorm2d.
    """

    features: int
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        scale, bias, mean, var = map(jax.lax.stop_gradient, (scale, bias, mean, var))
        mul = (scale * jax.lax.rsqrt(var + self.epsilon)).astype(self.dtype)
        add = (bias - mean * scale * jax.lax.rsqrt(var + self.epsilon)).astype(self.dtype)
        return x * mul + add


class MergedGroupConv(nn.Module):
    """Grouped conv with groups block-diagonally MERGED to >=128-wide.

    XLA lowers narrow-group convolutions catastrophically on TPU: the
    ResNeXt 32x8d groups (8-64 input channels each) measure 3-59
    TFLOP/s on v5e, while 128-wide groups hit ~165 TFLOP/s — nearly
    dense efficiency (devbench/exp_detector.py sweep). Packing m
    original groups into one 128-wide merged group costs m x the FLOPs
    (the off-diagonal blocks are zeros) but wins 1.4x (res5) to ~7x
    (res3) in wall time. The parameter keeps the compact grouped layout
    (k, k, cin/groups, cout) — identical tree to nn.Conv, so zoo-weight
    import is unchanged — and the merged kernel is materialised inside
    the graph (autodiff flows through the scatter, so training is
    gradient-exact).
    """

    features: int
    kernel: int
    stride: int
    groups: int
    dilation: int = 1
    target_group_width: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, g = self.kernel, self.groups
        cin = x.shape[-1]
        cgi = cin // g
        cgo = self.features // g
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, cgi, self.features),
        )
        m = min(g, max(1, self.target_group_width // cgi))
        while g % m:
            m -= 1
        if m > 1:
            w5 = w.reshape(k, k, cgi, g, cgo)
            sel = (
                (jnp.arange(g) % m)[:, None] == jnp.arange(m)[None, :]
            ).astype(w.dtype)
            w = jnp.einsum("abcgd,gp->abpcgd", w5, sel).reshape(
                k, k, m * cgi, self.features
            )
        pad = self.dilation * (k - 1) // 2
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w.astype(self.dtype),
            (self.stride, self.stride),
            ((pad, pad), (pad, pad)),
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=g // m,
        )


class ConvFrozenBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    act: bool = True
    dtype: Dtype = jnp.float32
    merged_group_width: int = 128

    @nn.compact
    def __call__(self, x):
        pad = self.dilation * (self.kernel - 1) // 2
        if self.groups > 1:
            x = MergedGroupConv(
                self.features, self.kernel, self.stride, self.groups,
                dilation=self.dilation, dtype=self.dtype,
                target_group_width=self.merged_group_width, name="conv",
            )(x)
        else:
            x = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=pad,
                kernel_dilation=(self.dilation, self.dilation),
                use_bias=False,
                dtype=self.dtype,
                name="conv",
            )(x)
        x = FrozenBN(self.features, dtype=self.dtype, name="norm")(x)
        if self.act:
            x = nn.relu(x)
        return x


class BottleneckX(nn.Module):
    """Detectron2 BottleneckBlock: 1x1 -> 3x3(groups, stride) -> 1x1.

    Stride lives on the 3x3 (stride_in_1x1=False, the X-net/torchvision
    convention used by the X101 zoo model)."""

    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    stride_in_1x1: bool = True  # Caffe2/MSRA ResNet convention (R50/R101 zoo)
    dtype: Dtype = jnp.float32
    merged_group_width: int = 128

    @nn.compact
    def __call__(self, x):
        s1, s3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        out = ConvFrozenBN(self.bottleneck_channels, 1, s1, dtype=self.dtype, name="conv1")(x)
        out = ConvFrozenBN(
            self.bottleneck_channels, 3, s3, groups=self.groups,
            dilation=self.dilation, dtype=self.dtype,
            merged_group_width=self.merged_group_width, name="conv2",
        )(out)
        out = ConvFrozenBN(self.out_channels, 1, 1, act=False, dtype=self.dtype, name="conv3")(out)
        if self.stride != 1 or x.shape[-1] != self.out_channels:
            shortcut = ConvFrozenBN(
                self.out_channels, 1, self.stride, act=False, dtype=self.dtype, name="shortcut"
            )(x)
        else:
            shortcut = x
        return nn.relu(out + shortcut)


RESNET_STAGE_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    depth: int = 101
    groups: int = 1  # 32 for ResNeXt
    width_per_group: int = 64  # 8 for X101-32x8d
    stem_channels: int = 64
    res2_out_channels: int = 256
    freeze_at: int = 2  # freeze stem + res2, the zoo default
    stride_in_1x1: bool = True  # False for ResNeXt zoo weights
    out_features: tuple[str, ...] = ("res2", "res3", "res4", "res5")
    # MergedGroupConv packing target (lane width of the merged groups);
    # the FLOP-vs-utilization tradeoff knob for the grouped 3x3s
    merged_group_width: int = 128


# The reference's flagship trunk (config_4: X101-FPN).
RESNEXT101_32x8d = ResNetConfig(depth=101, groups=32, width_per_group=8, stride_in_1x1=False)
RESNET50_FPN = ResNetConfig(depth=50)
# config_2's trunk (object_detection_utils.py:46-50, R101-FPN). Dense
# convs: on TPU the int8 PTQ path hits full dense int8 rates here,
# unlike the grouped X101 (DEVNOTES round 2) — the serving detector.
RESNET101_FPN = ResNetConfig(depth=101)
# Tiny config for CPU tests.
RESNET_TINY = ResNetConfig(
    depth=50, stem_channels=8, res2_out_channels=16, freeze_at=0
)


class ResNetBackbone(nn.Module):
    config: ResNetConfig = RESNET50_FPN
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = x.astype(self.dtype)
        x = ConvFrozenBN(cfg.stem_channels, 7, 2, dtype=self.dtype, name="stem")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        if cfg.freeze_at >= 1:
            x = jax.lax.stop_gradient(x)

        stage_blocks = RESNET_STAGE_BLOCKS[cfg.depth]
        out_ch = cfg.res2_out_channels
        bottleneck = cfg.width_per_group * cfg.groups
        feats = {}
        for si, n_blocks in enumerate(stage_blocks):
            stride = 1 if si == 0 else 2
            for bi in range(n_blocks):
                x = BottleneckX(
                    out_channels=out_ch,
                    bottleneck_channels=bottleneck,
                    stride=stride if bi == 0 else 1,
                    groups=cfg.groups,
                    stride_in_1x1=cfg.stride_in_1x1,
                    dtype=self.dtype,
                    merged_group_width=cfg.merged_group_width,
                    name=f"res{si + 2}_b{bi}",
                )(x)
            if cfg.freeze_at >= si + 2:
                x = jax.lax.stop_gradient(x)
            feats[f"res{si + 2}"] = x
            out_ch *= 2
            bottleneck *= 2
        return {k: feats[k] for k in cfg.out_features}

    @property
    def out_channels(self) -> dict[str, int]:
        c = self.config.res2_out_channels
        return {f"res{i + 2}": c * 2**i for i in range(4)}
