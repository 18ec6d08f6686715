"""TridentNet project (TPU-native).

Semantic contract from the reference ``projects/TridentNet/tridentnet/``:

* ``TridentConv`` — ONE shared weight applied with per-branch dilation
  (and matching padding); at test time either all branches or only
  ``test_branch_idx`` (trident_conv.py:10-96).
* ``TridentBottleneckBlock`` — bottleneck whose 3x3 is a TridentConv;
  conv1/conv3/shortcut are shared plain convs applied per branch; the
  last block of the trident stage concatenates branches
  (trident_backbone.py:15-117).
* branch merge — per-image concat of all branches' detections followed
  by class-aware NMS + top-k (trident_rcnn.py:8-45).

TPU-first design: branches live on the BATCH axis. A trident stage maps
(B, H, W, C) -> (num_branch*B, H, W, C) at its concat block, so every
downstream module (res5, RPN, ROI heads) runs unchanged on the widened
batch — the XLA analogue of the reference's list-of-tensors plumbing,
with zero ragged structure. The branch merge is a fixed-shape reshape +
masked batched NMS (ops/nms.batched_nms_mask).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.resnet_backbone import ConvFrozenBN, FrozenBN
from ..ops import nms as nms_ops

Array = jax.Array


class TridentConv(nn.Module):
    """Weight-shared multi-dilation 3x3 conv (trident_conv.py:10-96).

    Input/output: (num_branch, B, H, W, C) stacked branches. At
    inference with ``test_branch_idx >= 0`` pass a single-branch stack
    (1, B, H, W, C) and set ``branch_idx`` accordingly.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    dilations: tuple[int, ...] = (1, 2, 3)
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Array, branch_idx: int | None = None) -> Array:
        k = self.kernel
        kernel = self.param(
            "kernel",
            nn.initializers.kaiming_normal(),
            (k, k, xs.shape[-1], self.features),
        ).astype(self.dtype)
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,)).astype(
                self.dtype
            )
            if self.use_bias
            else None
        )
        dils = (
            self.dilations
            if branch_idx is None
            else (self.dilations[branch_idx],)
        )
        assert xs.shape[0] == len(dils), (
            f"expected {len(dils)} branch planes, got {xs.shape[0]}"
        )
        outs = []
        for bi, d in enumerate(dils):
            pad = d * (k - 1) // 2
            y = jax.lax.conv_general_dilated(
                xs[bi].astype(self.dtype),
                kernel,
                (self.stride, self.stride),
                [(pad, pad), (pad, pad)],
                rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if bias is not None:
                y = y + bias
            outs.append(y)
        return jnp.stack(outs)


class TridentBottleneckBlock(nn.Module):
    """Bottleneck with a TridentConv 3x3 (trident_backbone.py:15-117).
    conv1/conv3/shortcut weights are shared across branches — they are
    applied on the folded (num_branch*B) batch. ``concat_output``: fold
    the branch axis into the batch axis for downstream stages."""

    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    dilations: tuple[int, ...] = (1, 2, 3)
    stride_in_1x1: bool = False
    concat_output: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Array, branch_idx: int | None = None) -> Array:
        nb, b = xs.shape[0], xs.shape[1]

        def fold(t):
            return t.reshape((t.shape[0] * t.shape[1],) + t.shape[2:])

        def unfold(t):
            return t.reshape((nb, b) + t.shape[1:])

        s1, s3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        out = ConvFrozenBN(
            self.bottleneck_channels, 1, s1, dtype=self.dtype, name="conv1"
        )(fold(xs))
        out = TridentConv(
            self.bottleneck_channels,
            3,
            s3,
            self.dilations,
            dtype=self.dtype,
            name="conv2",
        )(unfold(out), branch_idx)
        out = FrozenBN(self.bottleneck_channels, dtype=self.dtype, name="norm2")(
            fold(out)
        )
        out = nn.relu(out)
        out = ConvFrozenBN(
            self.out_channels, 1, 1, act=False, dtype=self.dtype, name="conv3"
        )(out)
        if self.stride != 1 or xs.shape[-1] != self.out_channels:
            shortcut = ConvFrozenBN(
                self.out_channels,
                1,
                self.stride,
                act=False,
                dtype=self.dtype,
                name="shortcut",
            )(fold(xs))
        else:
            shortcut = fold(xs)
        out = unfold(nn.relu(out + shortcut))
        if self.concat_output:
            # branch-major concat onto the batch axis — matches the
            # reference's torch.cat over the branch list
            return out.reshape((nb * b,) + out.shape[2:])
        return out


class TridentStage(nn.Module):
    """A trident res-stage: ``num_blocks`` TridentBottleneckBlocks, the
    last one concatenating branches into the batch axis
    (trident_backbone.py:119-127). Input (B, H, W, C); output
    (num_branch*B, H', W', out_channels)."""

    num_blocks: int
    out_channels: int
    bottleneck_channels: int
    stride: int = 2
    dilations: tuple[int, ...] = (1, 2, 3)
    stride_in_1x1: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, branch_idx: int | None = None) -> Array:
        nb = 1 if branch_idx is not None else len(self.dilations)
        xs = jnp.broadcast_to(x[None], (nb,) + x.shape)
        for bi in range(self.num_blocks):
            xs = TridentBottleneckBlock(
                out_channels=self.out_channels,
                bottleneck_channels=self.bottleneck_channels,
                stride=self.stride if bi == 0 else 1,
                dilations=self.dilations,
                stride_in_1x1=self.stride_in_1x1,
                concat_output=(bi == self.num_blocks - 1),
                dtype=self.dtype,
                name=f"block{bi}",
            )(xs, branch_idx)
        return xs


def merge_branch_detections(
    boxes: Array,  # (num_branch*B, R, 4) padded per-branch detections
    scores: Array,  # (num_branch*B, R)
    classes: Array,  # (num_branch*B, R)
    valid: Array,  # (num_branch*B, R)
    num_branch: int,
    nms_thresh: float = 0.5,
    topk: int = 100,
) -> tuple[Array, Array, Array, Array]:
    """Fixed-shape branch merge (trident_rcnn.py:8-45): per image,
    concat all branches' padded detections, class-aware NMS, keep the
    top-k by score. Branch-major layout (branch j of image i at row
    i + B*j), matching the reference's `instances[i + batch_size * j]`.

    Returns (boxes (B, topk, 4), scores, classes, valid)."""
    nb_b = boxes.shape[0]
    b = nb_b // num_branch
    r = boxes.shape[1]

    def regroup(t):
        t = t.reshape((num_branch, b) + t.shape[1:])
        return jnp.moveaxis(t, 0, 1).reshape((b, num_branch * r) + t.shape[3:])

    bx, sc, cl, va = regroup(boxes), regroup(scores), regroup(classes), regroup(valid)

    def one(bx, sc, cl, va):
        keep = nms_ops.batched_nms_mask(bx, sc, cl, nms_thresh, valid=va > 0)
        keep = keep & (va > 0)
        masked = jnp.where(keep, sc, -jnp.inf)
        top_sc, idx = jax.lax.top_k(masked, min(topk, masked.shape[0]))
        return (
            bx[idx],
            jnp.where(jnp.isfinite(top_sc), top_sc, 0.0),
            cl[idx],
            jnp.isfinite(top_sc),
        )

    return jax.vmap(one)(bx, sc, cl, va)
