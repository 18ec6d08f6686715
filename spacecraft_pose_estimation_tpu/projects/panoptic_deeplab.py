"""Panoptic-DeepLab project (TPU-native).

Semantic contract from the reference
``projects/Panoptic-DeepLab/panoptic_deeplab/``:

* semantic head = DeepLabV3+ decoder + extra head convs, DeepLabCE with
  per-pixel weights (panoptic_seg.py:223-355),
* instance-embedding head = shared V3+ decoder, center branch (Gaussian
  heatmap, MSE loss) + offset branch (pixel->center vector, L1 loss),
  both weight-normalized by the weight sum (panoptic_seg.py:365-571),
* post-processing (post_processing.py:9-234): threshold + maxpool-NMS
  center finding, nearest-center pixel grouping, majority-vote
  semantic/instance merge with the label_divisor panoptic id encoding,
* target generation (target_generator.py:52-155): per-segment Gaussian
  center splats, offset field, small-instance up-weighting, crowd
  ignore masks.

TPU-first design: post-processing is fixed-shape — centers are a static
top-K array with a validity mask (torch's dynamic `nonzero` becomes
top_k + mask), grouping is one (K, H*W) distance argmin, and the
majority vote is a (K, C) one-hot histogram argmax — the whole panoptic
fusion jits. The target generator is host-side numpy (data layer), like
the reference's.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from .deeplab import DeepLabV3PlusHead, deeplab_ce_loss
from .point_rend import upsample_bilinear

Array = jax.Array


# ---------------------------------------------------------------------------
# heads


class PanopticDeepLabSemSegHead(nn.Module):
    """V3+ decoder + head convs + predictor; weighted DeepLabCE
    (panoptic_seg.py:223-355)."""

    num_classes: int
    in_features: tuple[str, ...] = ("res2", "res5")
    in_strides: tuple[int, ...] = (4, 16)
    decoder_channels: tuple[int, ...] = (256, 256)
    head_channels: int = 256
    common_stride: int = 4
    loss_type: str = "hard_pixel_mining"
    ignore_value: int = -1
    loss_weight: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: dict, targets=None, weights=None,
                 train: bool = False):
        y = DeepLabV3PlusHead(
            num_classes=None,
            in_features=self.in_features,
            in_strides=self.in_strides,
            decoder_channels=self.decoder_channels,
            dtype=self.dtype,
            name="decoder",
        )(features)
        y = nn.relu(
            nn.Conv(self.decoder_channels[0], (3, 3), dtype=self.dtype, name="head0")(y)
        )
        y = nn.relu(
            nn.Conv(self.head_channels, (3, 3), dtype=self.dtype, name="head1")(y)
        )
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
            loss = deeplab_ce_loss(y, targets, self.ignore_value, topk, weights)
            return None, {"loss_sem_seg": loss * self.loss_weight}
        return y, {}


class PanopticDeepLabInsEmbedHead(nn.Module):
    """Center-heatmap + offset regression head (panoptic_seg.py:365-571).

    Inference returns (center (N,H,W,1), offset (N,H,W,2) in PIXELS at
    full common_stride-upsampled resolution — the reference multiplies
    the upsampled offsets by common_stride)."""

    in_features: tuple[str, ...] = ("res2", "res5")
    in_strides: tuple[int, ...] = (4, 16)
    decoder_channels: tuple[int, ...] = (128, 128)
    head_channels: int = 32
    common_stride: int = 4
    center_loss_weight: float = 200.0
    offset_loss_weight: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: dict, center_targets=None,
                 center_weights=None, offset_targets=None,
                 offset_weights=None, train: bool = False):
        y = DeepLabV3PlusHead(
            num_classes=None,
            in_features=self.in_features,
            in_strides=self.in_strides,
            decoder_channels=self.decoder_channels,
            dtype=self.dtype,
            name="decoder",
        )(features)

        def branch(tag, out_ch):
            h = nn.relu(
                nn.Conv(
                    self.decoder_channels[0], (3, 3), dtype=self.dtype,
                    name=f"{tag}_head0",
                )(y)
            )
            h = nn.relu(
                nn.Conv(
                    self.head_channels, (3, 3), dtype=self.dtype,
                    name=f"{tag}_head1",
                )(h)
            )
            return nn.Conv(
                out_ch,
                (1, 1),
                kernel_init=nn.initializers.normal(0.001),
                dtype=self.dtype,
                name=f"{tag}_predictor",
            )(h)

        center = branch("center", 1)
        offset = branch("offset", 2)
        center = upsample_bilinear(center.astype(jnp.float32), self.common_stride)
        offset = (
            upsample_bilinear(offset.astype(jnp.float32), self.common_stride)
            * self.common_stride
        )
        if not train:
            return center, offset, {}, {}
        # center: MSE * weights / sum(weights)
        cw = center_weights
        closs = jnp.sum((center[..., 0] - center_targets) ** 2 * cw)
        closs = jnp.where(jnp.sum(cw) > 0, closs / jnp.maximum(jnp.sum(cw), 1e-9), 0.0)
        # offset: L1 * weights / sum(weights); weights broadcast over the
        # 2 channels like the reference's elementwise multiply
        ow = offset_weights[..., None]
        oloss = jnp.sum(jnp.abs(offset - offset_targets) * ow)
        osum = jnp.sum(ow) * 1.0  # weight tensor already spans both channels
        oloss = jnp.where(jnp.sum(ow) > 0, oloss / jnp.maximum(osum, 1e-9), 0.0)
        return (
            None,
            None,
            {"loss_center": closs * self.center_loss_weight},
            {"loss_offset": oloss * self.offset_loss_weight},
        )


# ---------------------------------------------------------------------------
# post-processing (fixed-shape jax)


def find_instance_center(
    center: Array, threshold: float = 0.1, nms_kernel: int = 3, top_k: int = 200
) -> tuple[Array, Array]:
    """(H, W) heatmap -> (top_k, 2) (y, x) centers + (top_k,) validity.

    Reference (post_processing.py:9-41): threshold to -1, keep only
    local maxima of a nms_kernel maxpool, take all positives (top-k
    capped). Fixed-shape: always returns top_k rows, masked.
    """
    h, w = center.shape
    x = jnp.where(center > threshold, center, -1.0)
    pad = (nms_kernel - 1) // 2
    pooled = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (nms_kernel, nms_kernel), (1, 1),
        [(pad, pad), (pad, pad)],
    )
    x = jnp.where(x == pooled, x, -1.0)
    flat = x.reshape(-1)
    k = min(top_k, h * w)
    scores, idx = jax.lax.top_k(flat, k)
    pts = jnp.stack([idx // w, idx % w], axis=-1)
    return pts, scores > 0


def group_pixels(centers: Array, valid: Array, offsets: Array) -> Array:
    """Assign each pixel the id (1..K) of its nearest predicted center
    (post_processing.py:44-76). offsets (H, W, 2) as (dy, dx); invalid
    centers are pushed to +inf distance."""
    h, w, _ = offsets.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    loc = jnp.stack([yy + offsets[..., 0], xx + offsets[..., 1]], axis=-1)
    d = jnp.linalg.norm(
        centers[:, None, None, :].astype(jnp.float32) - loc[None], axis=-1
    )  # (K, H, W)
    d = jnp.where(valid[:, None, None], d, jnp.inf)
    return jnp.argmin(d, axis=0).astype(jnp.int32) + 1


def merge_semantic_and_instance(
    sem_seg: Array,  # (H, W) int class ids
    ins_seg: Array,  # (H, W) int in [0, K]
    thing_seg: Array,  # (H, W) bool/int foreground
    num_classes: int,
    max_instances: int,
    thing_mask_by_class: Array,  # (num_classes,) bool: class is a thing
    label_divisor: int = 1000,
    stuff_area: int = 2048,
    void_label: int = -1,
) -> Array:
    """Panoptic fusion (post_processing.py:111-162), fixed-shape:

    * per instance id, majority-vote its class from sem_seg inside the
      (thing ∧ instance) mask via a (K, C) histogram argmax;
    * re-number instances per class in instance-id order (the
      reference's Counter semantics);
    * paste stuff classes over unoccupied pixels when their free area
      ≥ stuff_area.
    """
    is_thing = (ins_seg > 0) & (thing_seg > 0)
    k_ids = jnp.arange(1, max_instances + 1)
    inst_masks = (ins_seg[None] == k_ids[:, None, None]) & is_thing[None]  # (K,H,W)
    onehot = jax.nn.one_hot(sem_seg, num_classes, dtype=jnp.float32)  # (H,W,C)
    hist = jnp.einsum("khw,hwc->kc", inst_masks.astype(jnp.float32), onehot)
    present = jnp.sum(hist, axis=1) > 0  # (K,)
    maj = jnp.argmax(hist, axis=1)  # (K,) majority class
    # Counter: new_ins_id = 1 + #earlier present instances of same class
    same = (maj[None, :] == maj[:, None]) & present[None, :] & present[:, None]
    earlier = jnp.tril(jnp.ones((max_instances, max_instances), bool), k=-1)
    new_id = 1 + jnp.sum(same & earlier, axis=1)
    pan_val = maj * label_divisor + new_id  # (K,)

    pan = jnp.full(sem_seg.shape, void_label, jnp.int32)
    for_k = jnp.sum(
        jnp.where(inst_masks & present[:, None, None], pan_val[:, None, None], 0),
        axis=0,
    )
    covered = jnp.any(inst_masks & present[:, None, None], axis=0)
    pan = jnp.where(covered, for_k.astype(jnp.int32), pan)

    # stuff: per class, area of (sem==c & ins==0) >= stuff_area
    stuff_free = (ins_seg == 0)[..., None] & (onehot > 0)  # (H,W,C)
    areas = jnp.sum(stuff_free, axis=(0, 1))  # (C,)
    ok = (areas >= stuff_area) & (~thing_mask_by_class)
    stuff_class = jnp.argmax(
        jnp.where(
            stuff_free & ok[None, None, :], jnp.ones_like(onehot), jnp.zeros_like(onehot)
        ),
        axis=-1,
    )
    stuff_hit = jnp.any(stuff_free & ok[None, None, :], axis=-1) & ~covered
    pan = jnp.where(stuff_hit, (stuff_class * label_divisor).astype(jnp.int32), pan)
    return pan


def get_panoptic_segmentation(
    sem_seg: Array,  # (H, W) predicted class ids
    center: Array,  # (H, W) heatmap
    offsets: Array,  # (H, W, 2) (dy, dx)
    thing_mask_by_class: Array,  # (C,) bool
    num_classes: int,
    label_divisor: int = 1000,
    stuff_area: int = 2048,
    void_label: int = -1,
    threshold: float = 0.1,
    nms_kernel: int = 7,
    top_k: int = 200,
) -> tuple[Array, Array, Array]:
    """Full fixed-shape panoptic fusion (post_processing.py:165-234).
    Returns (panoptic (H, W), centers (top_k, 2), center_valid)."""
    thing_seg = thing_mask_by_class[sem_seg]
    pts, valid = find_instance_center(center, threshold, nms_kernel, top_k)
    ins = jnp.where(
        jnp.any(valid),
        group_pixels(pts, valid, offsets) * thing_seg.astype(jnp.int32),
        jnp.zeros_like(sem_seg),
    )
    pan = merge_semantic_and_instance(
        sem_seg, ins, thing_seg, num_classes, top_k, thing_mask_by_class,
        label_divisor, stuff_area, void_label,
    )
    return pan, pts, valid


# ---------------------------------------------------------------------------
# target generation (host-side numpy, data layer)


@dataclasses.dataclass
class PanopticTargetGenerator:
    """Training-target synthesis (target_generator.py:7-155)."""

    ignore_label: int
    thing_ids: frozenset
    sigma: float = 8.0
    ignore_stuff_in_offset: bool = True
    small_instance_area: int = 4096
    small_instance_weight: float = 3.0
    ignore_crowd_in_semantic: bool = False

    def __call__(self, panoptic: np.ndarray, segments_info: list[dict]) -> dict:
        h, w = panoptic.shape
        semantic = np.full_like(panoptic, self.ignore_label, dtype=np.int64)
        center = np.zeros((h, w), np.float32)
        offset = np.zeros((h, w, 2), np.float32)
        sem_w = np.ones((h, w), np.float32)
        center_w = np.zeros((h, w), np.float32)
        offset_w = np.zeros((h, w), np.float32)
        yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                             np.arange(w, dtype=np.float32), indexing="ij")
        size = int(6 * self.sigma + 3)
        gx = np.arange(size, dtype=np.float32)
        g0 = 3 * self.sigma + 1
        g = np.exp(-((gx - g0) ** 2 + (gx[:, None] - g0) ** 2) / (2 * self.sigma**2))
        pts = []
        for seg in segments_info:
            cat, sid = seg["category_id"], seg["id"]
            m = panoptic == sid
            if not (self.ignore_crowd_in_semantic and seg.get("iscrowd", 0)):
                semantic[m] = cat
            if not seg.get("iscrowd", 0):
                center_w[m] = 1
                if not self.ignore_stuff_in_offset or cat in self.thing_ids:
                    offset_w[m] = 1
            if cat in self.thing_ids:
                idx = np.nonzero(m)
                if idx[0].size == 0:
                    continue
                if idx[0].size < self.small_instance_area:
                    sem_w[m] = self.small_instance_weight
                cy, cx = float(np.mean(idx[0])), float(np.mean(idx[1]))
                pts.append((cy, cx))
                y, x = int(round(cy)), int(round(cx))
                ul = (int(np.round(x - 3 * self.sigma - 1)),
                      int(np.round(y - 3 * self.sigma - 1)))
                br = (int(np.round(x + 3 * self.sigma + 2)),
                      int(np.round(y + 3 * self.sigma + 2)))
                gx0, gx1 = max(0, -ul[0]), min(br[0], w) - ul[0]
                gy0, gy1 = max(0, -ul[1]), min(br[1], h) - ul[1]
                cx0, cx1 = max(0, ul[0]), min(br[0], w)
                cy0, cy1 = max(0, ul[1]), min(br[1], h)
                center[cy0:cy1, cx0:cx1] = np.maximum(
                    center[cy0:cy1, cx0:cx1], g[gy0:gy1, gx0:gx1]
                )
                offset[..., 0][idx] = cy - yy[idx]
                offset[..., 1][idx] = cx - xx[idx]
        return dict(
            sem_seg=semantic,
            center=center,
            center_points=pts,
            offset=offset,
            sem_seg_weights=sem_w,
            center_weights=center_w,
            offset_weights=offset_w,
        )
