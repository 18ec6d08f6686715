"""Shared conv building blocks (NHWC, mixed-precision-ready Flax linen).

TPU-first counterparts of the torch blocks used across the reference's two
model stacks (HRNet BasicBlock/Bottleneck, lib/models/pose_hrnet.py:28-98;
detectron2 resnet blocks). Layout is NHWC so XLA tiles convs straight onto
the MXU; compute dtype is configurable (bfloat16 for speed) while params
and BN statistics stay float32.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax.numpy as jnp
from flax import linen as nn

# torch BatchNorm2d(momentum=0.1) == flax BatchNorm(momentum=0.9).
BN_MOMENTUM = 0.9
BN_EPS = 1e-5

Dtype = Any


class ConvBN(nn.Module):
    """Conv -> BatchNorm -> optional ReLU, the universal trunk unit."""

    features: int
    kernel: int = 3
    stride: int = 1
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # explicit symmetric k//2 padding: identical to 'SAME' at stride 1
        # but matches torch Conv2d(padding=k//2) at stride 2 (where XLA
        # 'SAME' pads asymmetrically on even inputs)
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=self.kernel // 2,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            name="bn",
        )(x)
        if self.act:
            x = nn.relu(x)
        return x


class BasicBlock(nn.Module):
    """Two 3x3 convs + identity/projection residual (expansion 1)."""

    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = ConvBN(self.features, 3, self.stride, act=True, dtype=self.dtype, name="conv1")(x, train)
        y = ConvBN(self.features, 3, 1, act=False, dtype=self.dtype, name="conv2")(y, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = ConvBN(
                self.features, 1, self.stride, act=False, dtype=self.dtype, name="down"
            )(x, train)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 residual block (expansion 4)."""

    features: int  # bottleneck width; output is features * 4
    stride: int = 1
    dtype: Dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.features * self.expansion
        residual = x
        y = ConvBN(self.features, 1, 1, act=True, dtype=self.dtype, name="conv1")(x, train)
        y = ConvBN(self.features, 3, self.stride, act=True, dtype=self.dtype, name="conv2")(y, train)
        y = ConvBN(out_ch, 1, 1, act=False, dtype=self.dtype, name="conv3")(y, train)
        if self.stride != 1 or x.shape[-1] != out_ch:
            residual = ConvBN(out_ch, 1, self.stride, act=False, dtype=self.dtype, name="down")(x, train)
        return nn.relu(y + residual)


BLOCKS: dict[str, type[nn.Module]] = {"BASIC": BasicBlock, "BOTTLENECK": Bottleneck}


def block_expansion(block: str) -> int:
    return 1 if block == "BASIC" else 4


def upsample_nearest(x, factor: int):
    """Nearest-neighbour x`factor` upsample via broadcast+reshape.

    Measured 9.5x faster than ``jnp.repeat`` on v5e (repeat lowers to a
    gather-like HLO; broadcast_in_dim + reshape stays a pure relayout).
    """
    b, h, w, c = x.shape
    y = jnp.broadcast_to(
        x[:, :, None, :, None, :], (b, h, factor, w, factor, c)
    )
    return y.reshape(b, h * factor, w * factor, c)


def upsample_bilinear(x, factor: int):
    """Bilinear upsample with half-pixel centers (torch align_corners=False)."""
    import jax

    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * factor, w * factor, c), method="bilinear")


class ConvSeq(nn.Module):
    """A plain sequence of ConvBN layers (used in transitions/fuse paths)."""

    specs: Sequence[tuple[int, int, int, bool]]  # (features, kernel, stride, act)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, (f, k, s, a) in enumerate(self.specs):
            x = ConvBN(f, k, s, act=a, dtype=self.dtype, name=f"seq{i}")(x, train)
        return x
