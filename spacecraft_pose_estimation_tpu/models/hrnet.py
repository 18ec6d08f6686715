"""HRNet family for landmark heatmap regression (NHWC Flax, TPU-first).

Functional equivalents of the reference's three heatmap networks:

* ``pose_hrnet`` — HRNet-W32 trunk, single 1/4-resolution heatmap head
  (lib/models/pose_hrnet.py:274-460).
* ``hrnet_cms`` — same trunk but stage4 keeps all four branches; each
  branch gets a ConvTranspose(stride 4) + conv head to full input
  resolution, fused top-down with bilinear x2 upsampling; training mode
  also returns the four per-scale maps (lib/models/hrnet_cms.py:324-420,
  551-562).
* ``hrnet_cms_384`` — identical but stride-2 deconvs, so heads live at
  half input resolution (lib/models/hrnet_cms_384.py:353-412).

Architecture notes vs the reference (deliberate, TPU-native):
  - layout NHWC; bfloat16 compute dtype supported (params stay f32),
  - nearest upsampling in fuse layers via repeat (identical math),
  - trunk init is he-normal rather than the reference's N(0, 0.001)
    (which it always overwrote with ImageNet weights); heads use
    N(0, 0.001) as the reference does,
  - deconv padding is the explicit torch-equivalent (k-2, k-1) per side,
    so k5/s4/p1/op1 and k3/s2/p1/op1 match torch bit-for-bit (importer
    flips the kernel spatially; see utils/torch_import.hrnet_torch_to_flax).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    BLOCKS,
    BN_EPS,
    BN_MOMENTUM,
    ConvBN,
    block_expansion,
    upsample_bilinear,
    upsample_nearest,
)

Dtype = Any


@dataclasses.dataclass(frozen=True)
class StageSpec:
    """One parallel multi-resolution stage (a chain of HR modules)."""

    num_modules: int
    num_branches: int
    num_blocks: Sequence[int]
    num_channels: Sequence[int]
    block: str = "BASIC"


@dataclasses.dataclass(frozen=True)
class HRNetConfig:
    num_joints: int = 17
    stem_channels: int = 64
    stage1_blocks: int = 4  # Bottleneck x4 at stem resolution
    stage2: StageSpec = StageSpec(1, 2, (4, 4), (32, 64))
    stage3: StageSpec = StageSpec(4, 3, (4, 4, 4), (32, 64, 128))
    stage4: StageSpec = StageSpec(3, 4, (4, 4, 4, 4), (32, 64, 128, 256))
    final_conv_kernel: int = 1
    head: str = "classic"  # classic | cms | cms_half
    head_deconv_channels: int = 32

    def with_joints(self, num_joints: int) -> "HRNetConfig":
        return dataclasses.replace(self, num_joints=num_joints)


POSE_HRNET_W32 = HRNetConfig(head="classic")
HRNET_CMS = HRNetConfig(head="cms")
HRNET_CMS_384 = HRNetConfig(head="cms_half")

# Golden-parity harness config: stem/layer1 match the torch reference's
# HARDCODED structure (pose_hrnet.py: stem 64ch, Bottleneck x4 at 64),
# stages small enough for a CPU torch oracle run. The torch side is
# produced from the same spec via tests/test_golden_stage_parity.py's
# tiny yaml (STAGE*.NUM_CHANNELS/NUM_BLOCKS/NUM_MODULES).
HRNET_GOLDEN = HRNetConfig(
    stem_channels=64,
    stage1_blocks=4,
    stage2=StageSpec(1, 2, (1, 1), (8, 16)),
    stage3=StageSpec(1, 3, (1, 1, 1), (8, 16, 32)),
    stage4=StageSpec(1, 4, (1, 1, 1, 1), (8, 16, 32, 64)),
)

# A tiny config for CPU tests.
HRNET_TINY = HRNetConfig(
    stem_channels=8,
    stage1_blocks=1,
    stage2=StageSpec(1, 2, (1, 1), (4, 8)),
    stage3=StageSpec(1, 3, (1, 1, 1), (4, 8, 16)),
    stage4=StageSpec(1, 4, (1, 1, 1, 1), (4, 8, 16, 32)),
)

_head_init = nn.initializers.normal(stddev=0.001)


class Branch(nn.Module):
    """One resolution branch: a chain of residual blocks."""

    block: str
    features: int
    num_blocks: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        blk = BLOCKS[self.block]
        for i in range(self.num_blocks):
            x = blk(features=self.features, dtype=self.dtype, name=f"block{i}")(x, train)
        return x


class FuseLayer(nn.Module):
    """Cross-resolution exchange: every output branch sums all inputs.

    Per lib/models/pose_hrnet.py:187-242: finer->coarser via chained
    stride-2 3x3 ConvBNs (ReLU on all but the last), coarser->finer via
    1x1 ConvBN + nearest upsample, then ReLU on the sum.
    """

    out_channels: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        n = len(xs)
        outs = []
        for i, ci in enumerate(self.out_channels):
            acc = None
            for j, x in enumerate(xs):
                if j > i:
                    y = ConvBN(ci, 1, 1, act=False, dtype=self.dtype, name=f"up{i}_{j}")(x, train)
                    y = upsample_nearest(y, 2 ** (j - i))
                elif j == i:
                    y = x
                else:
                    y = x
                    for k in range(i - j):
                        last = k == i - j - 1
                        y = ConvBN(
                            ci if last else self.out_channels[j],
                            3,
                            2,
                            act=not last,
                            dtype=self.dtype,
                            name=f"down{i}_{j}_{k}",
                        )(y, train)
                acc = y if acc is None else acc + y
            outs.append(nn.relu(acc))
        return outs


class HRModule(nn.Module):
    """Parallel branches + fuse exchange (HighResolutionModule)."""

    spec: StageSpec
    multi_scale_output: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        exp = block_expansion(self.spec.block)
        chans = [c * exp for c in self.spec.num_channels]
        ys = [
            Branch(
                self.spec.block, chans[i], self.spec.num_blocks[i], dtype=self.dtype, name=f"branch{i}"
            )(x, train)
            for i, x in enumerate(xs)
        ]
        if len(ys) == 1:
            return ys
        out_chans = chans if self.multi_scale_output else chans[:1]
        return FuseLayer(out_chans, dtype=self.dtype, name="fuse")(ys, train)


class Transition(nn.Module):
    """Adapt previous-stage branch set to the next stage's widths/count.

    Per pose_hrnet.py:333-372: same-resolution branches get a 3x3 ConvBN
    only when widths differ; each new (coarser) branch is a stride-2 3x3
    ConvBN chain from the previous last branch.
    """

    out_channels: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        n_pre = len(xs)
        outs = []
        for i, ci in enumerate(self.out_channels):
            if i < n_pre:
                if xs[i].shape[-1] != ci:
                    outs.append(
                        ConvBN(ci, 3, 1, act=True, dtype=self.dtype, name=f"adapt{i}")(xs[i], train)
                    )
                else:
                    outs.append(xs[i])
            else:
                y = xs[-1]
                for j in range(i + 1 - n_pre):
                    ch = ci if j == i - n_pre else xs[-1].shape[-1]
                    y = ConvBN(ch, 3, 2, act=True, dtype=self.dtype, name=f"new{i}_{j}")(y, train)
                outs.append(y)
        return outs


class CMSHead(nn.Module):
    """Deconv + conv head lifting one branch to (near-)input resolution."""

    num_joints: int
    deconv_stride: int
    deconv_channels: int
    final_kernel: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = 5 if self.deconv_stride == 4 else 3
        # torch ConvTranspose2d(k, stride, padding=1, output_padding=1)
        # equals XLA conv_transpose with explicit per-side padding
        # (k-1-p, k-1-p+op) = (k-2, k-1); verified numerically against the
        # reference heads (hrnet_cms.py:353-369). 'SAME' would shift the
        # output grid, breaking checkpoint parity and keypoint alignment.
        pad = (k - 2, k - 1)
        x = nn.ConvTranspose(
            self.deconv_channels,
            (k, k),
            strides=(self.deconv_stride, self.deconv_stride),
            padding=(pad, pad),
            kernel_init=_head_init,
            dtype=self.dtype,
            name="deconv",
        )(x)
        x = nn.Conv(
            self.num_joints,
            (self.final_kernel, self.final_kernel),
            padding="SAME" if self.final_kernel > 1 else "VALID",
            kernel_init=_head_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        return x


class HRNet(nn.Module):
    """The full HRNet trunk with a selectable head (see module docstring).

    Call returns:
      - head == 'classic': (B, H/4, W/4, J) heatmaps.
      - head in ('cms', 'cms_half'), train=False: fused finest map.
      - head in ('cms', 'cms_half'), train=True or return_all_scales:
        tuple of 4 maps, finest-first, each half the resolution of the
        previous (return_all_scales gives the 4-scale maps under eval
        BN stats — used by DA evaluation and parity tests).
    """

    config: HRNetConfig = POSE_HRNET_W32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_all_scales: bool = False):
        cfg = self.config
        x = x.astype(self.dtype)

        # Stem: two stride-2 3x3 convs -> 1/4 resolution.
        x = ConvBN(cfg.stem_channels, 3, 2, act=True, dtype=self.dtype, name="stem1")(x, train)
        x = ConvBN(cfg.stem_channels, 3, 2, act=True, dtype=self.dtype, name="stem2")(x, train)
        x = Branch("BOTTLENECK", cfg.stem_channels, cfg.stage1_blocks, dtype=self.dtype, name="layer1")(
            x, train
        )

        xs = [x]
        for si, spec in enumerate((cfg.stage2, cfg.stage3, cfg.stage4)):
            exp = block_expansion(spec.block)
            widths = [c * exp for c in spec.num_channels]
            xs = Transition(widths, dtype=self.dtype, name=f"transition{si + 1}")(xs, train)
            last_stage = si == 2
            keep_all = cfg.head != "classic"
            for m in range(spec.num_modules):
                multi = True
                if last_stage and not keep_all and m == spec.num_modules - 1:
                    multi = False
                xs = HRModule(
                    spec, multi_scale_output=multi, dtype=self.dtype, name=f"stage{si + 2}_m{m}"
                )(xs, train)

        if cfg.head == "classic":
            out = nn.Conv(
                cfg.num_joints,
                (cfg.final_conv_kernel, cfg.final_conv_kernel),
                padding="SAME" if cfg.final_conv_kernel > 1 else "VALID",
                kernel_init=_head_init,
                dtype=self.dtype,
                name="final_layer",
            )(xs[0])
            return out.astype(jnp.float32)

        stride = 4 if cfg.head == "cms" else 2
        heads = [
            CMSHead(
                cfg.num_joints,
                stride,
                cfg.head_deconv_channels,
                cfg.final_conv_kernel,
                dtype=self.dtype,
                name=f"head{i}",
            )(xs[i]).astype(jnp.float32)
            for i in range(4)
        ]
        # Top-down fusion: coarsest head upsampled x2 into the next finer.
        x4 = heads[3]
        x3 = heads[2] + upsample_bilinear(x4, 2)
        x2 = heads[1] + upsample_bilinear(x3, 2)
        x1 = heads[0] + upsample_bilinear(x2, 2)
        if train or return_all_scales:
            return x1, x2, x3, x4
        return x1
