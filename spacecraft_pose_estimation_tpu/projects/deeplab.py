"""DeepLab project: DeepLabV3 / V3+ semantic segmentation (TPU-native).

Semantic contract from the reference ``projects/DeepLab/deeplab/``:

* ``DeepLabCE`` — hard-pixel-mining cross entropy: per-pixel CE with
  ignore_index (zero loss at ignored pixels), keep the top-k% largest
  losses over ALL pixels, mean over the kept set (loss.py:6-40).
* ``DeepLabStem`` — 3x 3x3 convs (s2, s1, s1) + 3x3/s2 maxpool
  replacing the 7x7 ResNet stem (resnet.py:16-68).
* dilated res5: stride 1 with multi-grid dilations (1, 2, 4) x
  res5_dilation — output stride 16 (resnet.py:88-158, config.py:
  RES5_MULTI_GRID).
* ``DeepLabV3Head`` — ASPP on res5 + 1x1 predictor, x common_stride
  bilinear upsample (semantic_seg.py:263-348).
* ``DeepLabV3PlusHead`` — ASPP at the deepest level, then per-level
  decoder: 1x1 project low-level features, upsample, concat, 2x 3x3
  fuse convs (semantic_seg.py:15-260).
* ``warmup_poly_schedule`` — WarmupPolyLR (lr_scheduler.py:13-84,
  build_solver.py): lr = base * warmup * (1 - t/T)^0.9, optional
  constant ending.

TPU notes: NHWC, frozen-free GroupNorm-style plain convs with bias (the
reference defaults to SyncBN; the repo's global-batch BN equals SyncBN
exactly — see test_scaling.py), bilinear resizes are the torch
align_corners=False formulation shared with PointRend.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.extra_layers import ASPP
from ..models.resnet_backbone import (
    RESNET_STAGE_BLOCKS,
    BottleneckX,
    ConvFrozenBN,
    ResNetConfig,
)
from .point_rend import upsample_bilinear

Array = jax.Array


# ---------------------------------------------------------------------------
# loss


def deeplab_ce_loss(
    logits: Array,  # (N, H, W, C)
    labels: Array,  # (N, H, W) int
    ignore_label: int = -1,
    top_k_percent: float = 1.0,
    weights: Array | None = None,  # (N, H, W) per-pixel weights
) -> Array:
    """DeepLabCE (loss.py:6-40). Ignored pixels contribute zero loss but
    stay in the pool that top-k selects over (torch CE with ignore_index
    and reduction="none" emits exact zeros there)."""
    valid = labels != ignore_label
    tgt = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[..., None].astype(jnp.int32), axis=-1)[
        ..., 0
    ]
    nll = jnp.where(valid, nll, 0.0)
    if weights is not None:
        nll = nll * weights
    flat = nll.reshape(-1)
    if top_k_percent >= 1.0:
        return jnp.mean(flat)
    k = int(top_k_percent * flat.shape[0])
    top, _ = jax.lax.top_k(flat, max(k, 1))
    return jnp.mean(top)


def warmup_poly_schedule(
    base_lr: float,
    max_iters: int,
    warmup_iters: int = 1000,
    warmup_factor: float = 0.001,
    power: float = 0.9,
    constant_ending: float = 0.0,
):
    """WarmupPolyLR as an optax-style schedule fn (lr_scheduler.py:13-84)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        alpha = jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0)
        warm = jnp.where(
            step < warmup_iters, warmup_factor * (1 - alpha) + alpha, 1.0
        )
        poly = jnp.power(jnp.maximum(1.0 - step / max_iters, 0.0), power)
        if constant_ending > 0:
            # constant ending once past warmup and below the floor
            poly = jnp.where(
                (warm >= 1.0) & (poly < constant_ending), constant_ending, poly
            )
        return base_lr * warm * poly

    return schedule


# ---------------------------------------------------------------------------
# backbone pieces


class DeepLabStem(nn.Module):
    """3x3(s2) -> 3x3 -> 3x3 convs + maxpool (resnet.py:16-68);
    out_channels//2 for the first two convs."""

    out_channels: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = self.out_channels // 2
        x = ConvFrozenBN(h, 3, 2, dtype=self.dtype, name="conv1")(x)
        x = ConvFrozenBN(h, 3, 1, dtype=self.dtype, name="conv2")(x)
        x = ConvFrozenBN(self.out_channels, 3, 1, dtype=self.dtype, name="conv3")(x)
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


@dataclasses.dataclass(frozen=True)
class DeepLabResNetConfig:
    resnet: ResNetConfig = ResNetConfig(depth=50)
    stem_channels: int = 128
    res4_dilation: int = 1
    res5_dilation: int = 2
    res5_multi_grid: tuple[int, ...] = (1, 2, 4)


DEEPLAB_R50 = DeepLabResNetConfig()
DEEPLAB_TINY = DeepLabResNetConfig(
    resnet=ResNetConfig(depth=50, stem_channels=8, res2_out_channels=16, freeze_at=0),
    stem_channels=16,
)


class DeepLabResNet(nn.Module):
    """ResNet with the DeepLab stem and dilated res4/res5 (output stride
    16 with res5_dilation=2, or 8 with res4_dilation=2) — resnet.py:
    71-158 semantics on the repo's BottleneckX blocks."""

    config: DeepLabResNetConfig = DEEPLAB_R50
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        rc = cfg.resnet
        x = DeepLabStem(cfg.stem_channels, dtype=self.dtype, name="stem")(x)
        stage_blocks = RESNET_STAGE_BLOCKS[rc.depth]
        out_ch = rc.res2_out_channels
        bottleneck = rc.width_per_group * rc.groups
        feats = {}
        for si, n_blocks in enumerate(stage_blocks):
            stage = si + 2
            if stage == 4:
                stride, dilation = (1, cfg.res4_dilation) if cfg.res4_dilation > 1 else (2, 1)
            elif stage == 5:
                stride = 1 if cfg.res5_dilation > 1 else 2
                dilation = cfg.res5_dilation
            else:
                stride, dilation = (1 if si == 0 else 2), 1
            for bi in range(n_blocks):
                if stage == 5:
                    grid = cfg.res5_multi_grid[bi % len(cfg.res5_multi_grid)]
                    d = dilation * grid
                else:
                    d = dilation
                x = BottleneckX(
                    out_channels=out_ch,
                    bottleneck_channels=bottleneck,
                    stride=stride if bi == 0 else 1,
                    groups=rc.groups,
                    dilation=d,
                    stride_in_1x1=rc.stride_in_1x1,
                    dtype=self.dtype,
                    name=f"res{stage}_b{bi}",
                )(x)
            feats[f"res{stage}"] = x
            out_ch *= 2
            bottleneck *= 2
        return feats


# ---------------------------------------------------------------------------
# heads


class DeepLabV3Head(nn.Module):
    """ASPP on one level + 1x1 predictor (semantic_seg.py:263-348).
    Returns logits at common_stride-upsampled resolution at inference;
    at train time returns the loss on upsampled logits."""

    num_classes: int
    in_feature: str = "res5"
    aspp_channels: int = 256
    aspp_dilations: tuple[int, ...] = (6, 12, 18)
    common_stride: int = 16
    loss_type: str = "hard_pixel_mining"
    ignore_value: int = -1
    loss_weight: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: dict, targets: Array | None = None,
                 train: bool = False):
        x = features[self.in_feature]
        x = ASPP(
            self.aspp_channels, self.aspp_dilations, dtype=self.dtype, name="aspp"
        )(x)
        x = nn.Conv(
            self.num_classes,
            (1, 1),
            kernel_init=nn.initializers.normal(0.001),
            dtype=self.dtype,
            name="predictor",
        )(x)
        y = upsample_bilinear(x.astype(jnp.float32), self.common_stride)
        if train:
            topk = 0.2 if self.loss_type == "hard_pixel_mining" else 1.0
            loss = deeplab_ce_loss(y, targets, self.ignore_value, topk)
            return None, {"loss_sem_seg": loss * self.loss_weight}
        return y, {}


class DeepLabV3PlusHead(nn.Module):
    """Encoder-decoder head (semantic_seg.py:15-260): ASPP at the
    deepest in_feature, then top-down decoder stages — 1x1 project the
    low-level feature, bilinearly upsample the running decoder state to
    its size, concat, fuse with two 3x3 convs."""

    num_classes: int | None
    in_features: tuple[str, ...] = ("res2", "res5")
    in_strides: tuple[int, ...] = (4, 16)
    project_channels: tuple[int, ...] = (48,)
    aspp_channels: int = 256
    aspp_dilations: tuple[int, ...] = (6, 12, 18)
    decoder_channels: tuple[int, ...] = (256, 256)
    common_stride: int = 4
    loss_type: str = "hard_pixel_mining"
    ignore_value: int = -1
    loss_weight: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: dict, targets: Array | None = None,
                 train: bool = False):
        assert len(self.project_channels) == len(self.in_features) - 1
        assert len(self.decoder_channels) == len(self.in_features)
        y = None
        order = list(range(len(self.in_features)))[::-1]  # deep -> shallow
        for idx in order:
            f = self.in_features[idx]
            x = features[f]
            if idx == len(self.in_features) - 1:
                y = ASPP(
                    self.aspp_channels,
                    self.aspp_dilations,
                    dtype=self.dtype,
                    name=f"aspp_{f}",
                )(x)
            else:
                proj = nn.relu(
                    nn.Conv(
                        self.project_channels[idx],
                        (1, 1),
                        dtype=self.dtype,
                        name=f"project_{f}",
                    )(x)
                )
                factor = self.in_strides[idx + 1] // self.in_strides[idx]
                y = upsample_bilinear(y.astype(jnp.float32), factor).astype(
                    proj.dtype
                )
                y = jnp.concatenate([proj, y], axis=-1)
                y = nn.relu(
                    nn.Conv(
                        self.decoder_channels[idx],
                        (3, 3),
                        dtype=self.dtype,
                        name=f"fuse_{f}_0",
                    )(y)
                )
                y = nn.relu(
                    nn.Conv(
                        self.decoder_channels[idx],
                        (3, 3),
                        dtype=self.dtype,
                        name=f"fuse_{f}_1",
                    )(y)
                )
        if self.num_classes is None:
            return y  # decoder_only (Panoptic-DeepLab reuses this)
        y = nn.Conv(
            self.num_classes,
            (1, 1),
            kernel_init=nn.initializers.normal(0.001),
            dtype=self.dtype,
            name="predictor",
        )(y)
        y = upsample_bilinear(y.astype(jnp.float32), self.common_stride)
        if train:
            topk = 0.2 if self.loss_type == "hard_pixel_mining" else 1.0
            loss = deeplab_ce_loss(y, targets, self.ignore_value, topk)
            return None, {"loss_sem_seg": loss * self.loss_weight}
        return y, {}
