"""Landmark-regression dataset pipeline, host load + device transform.

The reference hides cv2 decode / random affine / gaussian synthesis in
torch DataLoader workers (lib/dataset/JointsDataset.py:121-229). The
TPU-native split:

* host (this module): COCO json -> example table; image decode to raw
  frames; shuffled infinite batches of numpy arrays (double-buffered by
  a background thread);
* device (`device_transform`): per-example random scale/rot sampling
  (the reference's exact distributions), affine crop via ops.warp,
  ImageNet normalisation, Gaussian target synthesis — all inside the
  jitted train step, so the accelerator does the augmentation math.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Iterator

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import heatmap as hm_ops
from ..ops import warp as warp_ops
from ..ops.geometry import apply_affine, bbox_to_center_scale, crop_affine_matrix
from ..pipeline import normalize_crops
from . import coco_io
from .loader import parallel_batches

Array = jax.Array


class LandmarkExamples:
    """COCO json + image dir -> indexable example table (events.py _get_db)."""

    def __init__(self, coco_json: str, image_dir: str, num_joints: int | None = None):
        self.records = coco_io.coco_to_examples(coco_io.load_coco(coco_json))
        self.image_dir = image_dir
        self.num_joints = num_joints or self.records[0]["joints"].shape[0]

    def __len__(self):
        return len(self.records)

    def load_image(self, i: int, color_rgb: bool = True) -> np.ndarray:
        import cv2

        rec = self.records[i]
        path = os.path.join(self.image_dir, rec["file_name"])
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        if color_rgb:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        return img

    def example(self, i: int, color_rgb: bool = True) -> dict:
        rec = self.records[i]
        return {
            "image": self.load_image(i, color_rgb).astype(np.float32),
            "bbox": rec["bbox"].astype(np.float32),
            "joints": rec["joints"].astype(np.float32),
            "joints_vis": rec["joints_vis"].astype(np.float32),
            "image_id": rec["image_id"],
        }


def batch_iterator(
    examples: LandmarkExamples,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    loop: bool = True,
    prefetch: int = 4,
    num_workers: int | None = None,
) -> Iterator[dict]:
    """Infinite (or single-pass) shuffled numpy batches, decoded by a
    cv2-GIL-releasing thread pool with `prefetch` batches in flight —
    the stand-in for torch DataLoader worker processes (data/loader.py)."""

    def index_gen():
        rng = np.random.default_rng(seed)
        n = len(examples)
        while True:
            order = rng.permutation(n) if shuffle else np.arange(n)
            for start in range(0, n - batch_size + 1, batch_size):
                yield None, [int(i) for i in order[start : start + batch_size]]
            if not loop:
                return

    def collate(_meta, exs):
        return {
            "image": np.stack([e["image"] for e in exs]),
            "bbox": np.stack([e["bbox"] for e in exs]),
            "joints": np.stack([e["joints"] for e in exs]),
            "joints_vis": np.stack([e["joints_vis"] for e in exs]),
            "image_id": np.array([e["image_id"] for e in exs]),
        }

    yield from parallel_batches(
        index_gen(), examples.example, collate,
        num_workers=num_workers, prefetch_batches=prefetch,
    )


class DeviceDatasetCache:
    """Entire example table resident on device: uint8 frames + geometry.

    The serving/training host next to the TPU tunnel uploads ~20 MB/s;
    re-sending each batch of raw frames per step (24 x 854x480x3 f32 =
    118 MB) measured 75 s/epoch on the r5 accuracy run — 30x the step's
    actual compute. A whole 279-frame event split is 343 MB as uint8,
    so it is uploaded ONCE and batches are gathered on device by index
    (the reference has no analogue: torch DataLoader workers feed a
    local PCIe GPU, lib/dataset/JointsDataset.py:121-229).

    Numerically identical to the host path: frames hold integral 0..255
    values and ops.warp casts to f32 before interpolation.
    """

    def __init__(self, examples: LandmarkExamples, color_rgb: bool = True):
        import jax.numpy as jnp

        imgs = np.stack(
            [examples.load_image(i, color_rgb) for i in range(len(examples))]
        )
        self.nbytes = imgs.nbytes
        self.images = jnp.asarray(imgs)  # (N, H, W, 3) uint8
        recs = examples.records
        self.bboxes = jnp.asarray(
            np.stack([r["bbox"] for r in recs]).astype(np.float32)
        )
        self.joints = jnp.asarray(
            np.stack([r["joints"] for r in recs]).astype(np.float32)
        )
        self.joints_vis = jnp.asarray(
            np.stack([r["joints_vis"] for r in recs]).astype(np.float32)
        )

    def gather(self, idx: np.ndarray):
        """Device-side batch gather. idx: (B,) host ints (a few dozen
        bytes up the tunnel instead of the frame batch)."""
        i = jnp.asarray(np.asarray(idx, np.int32))
        return (
            jnp.take(self.images, i, axis=0),
            jnp.take(self.bboxes, i, axis=0),
            jnp.take(self.joints, i, axis=0),
            jnp.take(self.joints_vis, i, axis=0),
        )


def index_iterator(
    n: int, batch_size: int, shuffle: bool = True, seed: int = 0, loop: bool = True
) -> Iterator[np.ndarray]:
    """The index stream of `batch_iterator` without the host decode —
    pairs with `DeviceDatasetCache.gather`. Same rng/permutation scheme,
    so the example order matches the host path exactly."""
    rng = np.random.default_rng(seed)
    while True:
        order = rng.permutation(n) if shuffle else np.arange(n)
        for start in range(0, n - batch_size + 1, batch_size):
            yield order[start : start + batch_size]
        if not loop:
            return


def sample_augmentation(
    key: Array, batch: int, scale_factor: float, rot_factor: float, rot_prob: float = 0.6
) -> tuple[Array, Array]:
    """Per-example random scale multiplier and rotation, reference
    distributions (JointsDataset.py:158-170): scale ~ clip(N(1, sf), 1-sf,
    1+sf); rot ~ clip(N(0, rf), -2rf, 2rf) applied with prob 0.6."""
    k1, k2, k3 = jax.random.split(key, 3)
    s = jnp.clip(
        jax.random.normal(k1, (batch,)) * scale_factor + 1.0,
        1.0 - scale_factor,
        1.0 + scale_factor,
    )
    r = jnp.clip(jax.random.normal(k2, (batch,)) * rot_factor, -2 * rot_factor, 2 * rot_factor)
    r = jnp.where(jax.random.uniform(k3, (batch,)) <= rot_prob, r, 0.0)
    return s, r


def half_body_center_scale(
    joints: Array,  # (J, 2) source coords
    joints_vis: Array,  # (J,) 0/1
    coin: Array,  # scalar ~ N(0,1) (the reference draws np.random.randn())
    upper_mask: Array,  # (J,) 1 where joint_id in upper_body_ids
    aspect_ratio: float,
    pixel_std: float = 200.0,
) -> tuple[Array, Array, Array]:
    """Half-body crop center/scale (JointsDataset.py:73-118), vectorised.

    Reference semantics: split visible joints into upper/lower body sets;
    pick the upper set when `randn() < 0.5 and len(upper) > 2`, else the
    lower set if it has >2 joints, else upper. Fewer than 2 selected
    joints -> invalid (caller keeps the bbox center/scale). Center is the
    selected-joint mean; scale spans their extent, aspect-corrected, /200,
    x1.5. Note the reference's coin is a NORMAL draw compared to 0.5
    (P(upper branch) = Phi(0.5) ~ 0.69) - preserved.

    Returns (valid, center (2,), scale (2,)).
    """
    vis = joints_vis > 0
    up_sel = vis & (upper_mask > 0)
    lo_sel = vis & (upper_mask <= 0)
    n_up = jnp.sum(up_sel)
    n_lo = jnp.sum(lo_sel)
    use_upper = ((coin < 0.5) & (n_up > 2)) | (n_lo <= 2)
    sel = jnp.where(use_upper, up_sel, lo_sel)
    n_sel = jnp.sum(sel)
    valid = n_sel >= 2

    w_mask = sel.astype(jnp.float32)
    denom = jnp.maximum(n_sel.astype(jnp.float32), 1.0)
    center = jnp.sum(joints[:, :2] * w_mask[:, None], axis=0) / denom
    big = jnp.float32(1e9)
    lt = jnp.min(jnp.where(sel[:, None], joints[:, :2], big), axis=0)
    rb = jnp.max(jnp.where(sel[:, None], joints[:, :2], -big), axis=0)
    w = rb[0] - lt[0]
    h = rb[1] - lt[1]
    # aspect correction (JointsDataset.py:102-106)
    h = jnp.where(w > aspect_ratio * h, w / aspect_ratio, h)
    w = jnp.where(w < aspect_ratio * h, h * aspect_ratio, w)
    scale = jnp.stack([w, h]) / pixel_std * 1.5
    return valid, center, scale


def apply_half_body(
    key: Array,
    joints: Array,  # (B, J, 2)
    joints_vis: Array,  # (B, J)
    centers: Array,  # (B, 2)
    scales: Array,  # (B, 2)
    upper_body_ids: tuple[int, ...],
    aspect_ratio: float,
    num_joints_half_body: int,
    prob_half_body: float,
) -> tuple[Array, Array]:
    """Gate + apply the half-body transform per example
    (JointsDataset.py:155-162): fires when the visible-joint count exceeds
    NUM_JOINTS_HALF_BODY and a uniform draw < PROB_HALF_BODY, and the
    selected half has >= 2 joints."""
    b = joints.shape[0]
    j = joints.shape[1]
    upper_mask = jnp.zeros((j,), jnp.float32).at[jnp.asarray(upper_body_ids, jnp.int32)].set(1.0)
    k1, k2 = jax.random.split(key)
    gate = (jnp.sum(joints_vis > 0, axis=1) > num_joints_half_body) & (
        jax.random.uniform(k1, (b,)) < prob_half_body
    )
    coins = jax.random.normal(k2, (b,))
    valid, hb_c, hb_s = jax.vmap(
        lambda jt, v, c: half_body_center_scale(jt, v, c, upper_mask, aspect_ratio)
    )(joints, joints_vis, coins)
    use = (gate & valid)[:, None]
    return jnp.where(use, hb_c, centers), jnp.where(use, hb_s, scales)


@partial(jax.jit, static_argnames=(
    "image_size", "heatmap_size", "sigma", "train",
    "upper_body_ids", "num_joints_half_body", "prob_half_body",
))
def device_transform(
    images: Array,  # (B, H, W, 3) raw source frames 0..255
    bboxes: Array,  # (B, 4) xywh
    joints: Array,  # (B, J, 2) source coords
    joints_vis: Array,  # (B, J)
    key: Array,
    image_size: tuple[int, int] = (512, 512),
    heatmap_size: tuple[int, int] = (128, 128),
    sigma: float = 2.0,
    train: bool = True,
    scale_factor: float = 0.25,
    rot_factor: float = 30.0,
    upper_body_ids: tuple[int, ...] = (),
    num_joints_half_body: int = 8,
    prob_half_body: float = 0.0,
) -> dict:
    """Random affine crop + normalize + heatmap targets, fully on device.

    Half-body crop augmentation (JointsDataset.py:73-130,155-162) fires
    only when `prob_half_body > 0` and `upper_body_ids` is non-empty —
    matching the reference, where every spacecraft config leaves
    DATASET.PROB_HALF_BODY at 0.0 and the datasets set upper_body_ids to
    None (events.py:35)."""
    b = images.shape[0]
    centers, scales = jax.vmap(bbox_to_center_scale)(bboxes)
    if train:
        key, hb_key = jax.random.split(key)
        if prob_half_body > 0.0 and len(upper_body_ids) > 0:
            centers, scales = apply_half_body(
                hb_key, joints, joints_vis, centers, scales,
                upper_body_ids, image_size[0] / image_size[1],
                num_joints_half_body, prob_half_body,
            )
        s_mult, rots = sample_augmentation(key, b, scale_factor, rot_factor)
        scales = scales * s_mult[:, None]
    else:
        rots = jnp.zeros(b)

    crops = warp_ops.batched_crop_and_resize(images, centers, scales, rots, image_size)
    inputs = normalize_crops(crops)

    def transform_joints(jts, c, s, r):
        M = crop_affine_matrix(c, s, r, image_size)
        return apply_affine(jts, M)

    joints_crop = jax.vmap(transform_joints)(joints, centers, scales, rots)
    target, tw = jax.vmap(
        lambda jt, v: hm_ops.generate_target(jt, v, image_size, heatmap_size, sigma)
    )(joints_crop, joints_vis)
    return {
        "image": inputs,
        "target": target,
        "target_weight": tw,
        "centers": centers,
        "scales": scales,
        "rotations": rots,
    }
