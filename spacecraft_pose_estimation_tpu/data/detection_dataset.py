"""Detection data pipeline: COCO -> fixed-shape batches for the RCNN.

Replacement for detectron2's data stack (data/build.py:282-483
build_detection_train_loader, dataset_mapper.py, the rank-sharded
Training/InferenceSampler and aspect-ratio grouping): the TPU version
letterboxes every image to ONE static size (no ragged ImageList), pads
GT to a fixed per-image budget with validity masks, and shards batches
by `jax.process_index()` for multi-host.

The fork's extra geometric augmentations (detection_utils.py:616-651:
RandomRotation [0,45] + RandomTranslation [-100,100]^2 appended to the
standard ResizeShortestEdge+flip stack) are applied host-side with cv2
so the box coordinates stay exact; the photometric event/SPEED+ family
runs on device (data/augment.py).
"""

from __future__ import annotations

import os
import random
from typing import Iterator

import numpy as np

from . import coco_io
from .loader import parallel_batches


def letterbox(img: np.ndarray, target_hw: tuple[int, int]) -> tuple[np.ndarray, float]:
    """Resize keeping aspect to fit target, pad bottom/right with zeros.

    Returns (padded image, scale). Boxes transform as b * scale."""
    import cv2

    th, tw = target_hw
    h, w = img.shape[:2]
    scale = min(th / h, tw / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    out = np.zeros((th, tw, *img.shape[2:]), img.dtype)
    out[:nh, :nw] = resized
    return out, scale


def rotate_with_boxes(
    img: np.ndarray, boxes_xyxy: np.ndarray, angle: float, expand: bool = True
):
    """Rotate about center; boxes -> rotated corners' AABB.

    ``expand`` (the d2 RotationTransform default used by the fork's
    T.RandomRotation([0,45])): the canvas grows to fit the whole rotated
    image, so no pixels or GT boxes are lost — the downstream letterbox
    rescales the bigger canvas to the fixed input size."""
    import cv2

    h, w = img.shape[:2]
    M = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
    if expand:
        abs_cos, abs_sin = abs(M[0, 0]), abs(M[0, 1])
        nw = int(np.rint(w * abs_cos + h * abs_sin))
        nh = int(np.rint(w * abs_sin + h * abs_cos))
        M[0, 2] += nw / 2 - w / 2
        M[1, 2] += nh / 2 - h / 2
        w, h = nw, nh
    out = cv2.warpAffine(img, M, (w, h), flags=cv2.INTER_LINEAR)
    if len(boxes_xyxy):
        corners = np.stack(
            [
                boxes_xyxy[:, [0, 1]],
                boxes_xyxy[:, [2, 1]],
                boxes_xyxy[:, [0, 3]],
                boxes_xyxy[:, [2, 3]],
            ],
            axis=1,
        )  # (N, 4, 2)
        ones = np.ones((*corners.shape[:2], 1))
        pts = np.concatenate([corners, ones], axis=-1) @ M.T  # (N, 4, 2)
        boxes_xyxy = np.concatenate([pts.min(axis=1), pts.max(axis=1)], axis=-1)
        boxes_xyxy[:, [0, 2]] = boxes_xyxy[:, [0, 2]].clip(0, w)
        boxes_xyxy[:, [1, 3]] = boxes_xyxy[:, [1, 3]].clip(0, h)
    return out, boxes_xyxy


def translate_with_boxes(img: np.ndarray, boxes_xyxy: np.ndarray, tx: float, ty: float):
    import cv2

    h, w = img.shape[:2]
    M = np.float32([[1, 0, tx], [0, 1, ty]])
    out = cv2.warpAffine(img, M, (w, h))
    if len(boxes_xyxy):
        boxes_xyxy = boxes_xyxy + np.array([tx, ty, tx, ty])
        boxes_xyxy[:, [0, 2]] = boxes_xyxy[:, [0, 2]].clip(0, w)
        boxes_xyxy[:, [1, 3]] = boxes_xyxy[:, [1, 3]].clip(0, h)
    return out, boxes_xyxy


class DetectionExamples:
    """COCO json + image dir -> per-image records with all annotations."""

    def __init__(self, coco_json: str, image_dir: str):
        coco = coco_io.load_coco(coco_json)
        anns_by_image: dict[int, list] = {}
        for ann in coco["annotations"]:
            anns_by_image.setdefault(ann["image_id"], []).append(ann)
        self.records = []
        for im in coco["images"]:
            anns = anns_by_image.get(im["id"], [])
            boxes = np.array(
                [[a["bbox"][0], a["bbox"][1], a["bbox"][0] + a["bbox"][2], a["bbox"][1] + a["bbox"][3]] for a in anns],
                np.float32,
            ).reshape(-1, 4)
            classes = np.array([a["category_id"] - 1 for a in anns], np.int32)
            self.records.append(
                {"file_name": im["file_name"], "image_id": im["id"], "boxes": boxes, "classes": classes}
            )
        self.image_dir = image_dir

    def __len__(self):
        return len(self.records)

    def load(self, i: int) -> dict:
        import cv2

        rec = self.records[i]
        img = cv2.imread(os.path.join(self.image_dir, rec["file_name"]), cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(rec["file_name"])
        return {**rec, "image": img}


def detection_batches(
    examples: DetectionExamples,
    batch_size: int,
    image_hw: tuple[int, int],
    max_gt: int = 16,
    train: bool = True,
    seed: int = 0,
    rotation_range: tuple[float, float] = (0.0, 45.0),
    translation_range: float = 100.0,
    augment: bool = True,
    flip: bool = False,
    process_index: int = 0,
    process_count: int = 1,
    num_workers: int | None = None,
    prefetch: int = 4,
) -> Iterator[dict]:
    """Infinite (train) / single-pass (eval) fixed-shape batches, decoded
    and augmented on a thread pool (data/loader.py).

    Multi-host sharding: each process takes every `process_count`-th
    example (distributed_sampler.py:15 semantics)."""
    rng = random.Random(seed + process_index)
    n = len(examples)
    indices = list(range(process_index, n, process_count))

    def make_example(key):
        epoch, i = key
        # per-(epoch, example) rng: thread-safe AND order-independent, so
        # parallel decoding reproduces the serial stream exactly
        nprng = np.random.default_rng((seed + process_index, epoch, i))
        ex = examples.load(i)
        img, boxes = ex["image"].astype(np.float32), ex["boxes"].copy()
        if train and augment:
            # fork build_augmentation order (detection_utils.py:632-651):
            # resize -> flip -> rotation [0,45] (expand) -> translation
            # +-100 px. Flip + expand-rotation commute with the resize, so
            # they run on the original; the +-100 translation acts on the
            # RESIZED image in the reference, so it runs post-letterbox.
            # ``flip`` defaults OFF: the flagship training preset
            # config_4 sets INPUT.RANDOM_FLIP='none'
            # (object_detection_utils.py:128); config_1-style presets
            # opt in (zoo.DetectorPreset.flip).
            if flip and nprng.random() < 0.5:
                w0 = img.shape[1]
                img = np.ascontiguousarray(img[:, ::-1])
                if len(boxes):
                    boxes[:, [0, 2]] = w0 - boxes[:, [2, 0]]
            angle = nprng.uniform(*rotation_range)
            img, boxes = rotate_with_boxes(img, boxes, angle, expand=True)
        img, scale = letterbox(img, image_hw)
        boxes = boxes * scale
        if train and augment:
            tx, ty = nprng.uniform(-translation_range, translation_range, 2)
            img, boxes = translate_with_boxes(img, boxes, tx, ty)
        g = len(boxes)
        gt_boxes = np.zeros((max_gt, 4), np.float32)
        gt_classes = np.zeros((max_gt,), np.int32)
        gt_valid = np.zeros((max_gt,), bool)
        keep = min(g, max_gt)
        if keep:
            wh_ok = ((boxes[:, 2] - boxes[:, 0]) > 1) & ((boxes[:, 3] - boxes[:, 1]) > 1)
            boxes, classes = boxes[wh_ok][:max_gt], ex["classes"][wh_ok][:max_gt]
            keep = len(boxes)
            gt_boxes[:keep] = boxes
            gt_classes[:keep] = classes
            gt_valid[:keep] = True
        return {
            "image": img,
            "gt_boxes": gt_boxes,
            "gt_classes": gt_classes,
            "gt_valid": gt_valid,
            "image_id": ex["image_id"],
            "scale": scale,
        }

    keys = ("image", "gt_boxes", "gt_classes", "gt_valid", "image_id", "scale")

    def index_gen():
        epoch = 0
        while True:
            order = indices.copy()
            if train:
                rng.shuffle(order)
            for start in range(0, len(order), batch_size):
                sel = order[start : start + batch_size]
                if len(sel) < batch_size:
                    if train:
                        break  # drop ragged tail during training
                    # eval: pad the tail (duplicates flagged via "count")
                    sel = sel + [sel[-1]] * (batch_size - len(sel))
                count = min(batch_size, len(order) - start)
                yield count, [(epoch, i) for i in sel]
            if not train:
                return
            epoch += 1

    def collate(count, chunk):
        batch = {k: np.stack([c[k] for c in chunk]) for k in keys}
        batch["count"] = count
        return batch

    yield from parallel_batches(
        index_gen(), make_example, collate,
        num_workers=num_workers, prefetch_batches=prefetch,
    )
