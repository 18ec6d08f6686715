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


@partial(jax.jit, static_argnames=("image_size", "heatmap_size", "sigma", "train"))
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
) -> dict:
    """Random affine crop + normalize + heatmap targets, fully on device."""
    b = images.shape[0]
    centers, scales = jax.vmap(bbox_to_center_scale)(bboxes)
    if train:
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
