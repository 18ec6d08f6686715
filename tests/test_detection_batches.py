"""Detection batch iterator: tail padding, sharding, augmentation."""

import json
import os

import numpy as np
import pytest

from spacecraft_pose_estimation_tpu.data import coco_io
from spacecraft_pose_estimation_tpu.data.detection_dataset import (
    DetectionExamples,
    detection_batches,
    letterbox,
    rotate_with_boxes,
    translate_with_boxes,
)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("det")
    rng = np.random.default_rng(0)
    images, anns = [], []
    for i in range(5):
        img = rng.integers(0, 255, (48, 64, 3)).astype(np.uint8)
        cv2.imwrite(str(root / f"{i}.png"), img)
        images.append(coco_io.image_record(f"{i}.png", 64, 48, i))
        kp = np.full((3, 3), 2.0)
        anns.append(coco_io.keypoint_annotation(kp, [4.0, 4.0, 30.0, 30.0], i, i))
    coco_io.save_coco(coco_io.build_coco_dict(images, anns, 3), str(root / "d.json"))
    return DetectionExamples(str(root / "d.json"), str(root))


class TestBatches:
    def test_eval_covers_all_with_padded_tail(self, dataset):
        batches = list(
            detection_batches(dataset, 2, (64, 64), train=False, augment=False)
        )
        counts = [b["count"] for b in batches]
        assert sum(counts) == 5
        assert counts == [2, 2, 1]
        assert batches[-1]["image"].shape[0] == 2  # padded to batch size

    def test_train_drops_tail_and_loops(self, dataset):
        it = detection_batches(dataset, 2, (64, 64), train=True, augment=False, seed=1)
        seen = [next(it) for _ in range(4)]  # > one epoch (2 batches/epoch)
        assert all(b["image"].shape[0] == 2 for b in seen)

    def test_process_sharding_partitions(self, dataset):
        ids0 = set()
        for b in detection_batches(dataset, 1, (64, 64), train=False, augment=False,
                                   process_index=0, process_count=2):
            ids0.update(b["image_id"][: b["count"]].tolist())
        ids1 = set()
        for b in detection_batches(dataset, 1, (64, 64), train=False, augment=False,
                                   process_index=1, process_count=2):
            ids1.update(b["image_id"][: b["count"]].tolist())
        assert ids0 | ids1 == {0, 1, 2, 3, 4}
        assert not (ids0 & ids1)

    def test_letterbox_scale(self):
        img = np.zeros((50, 100, 3), np.float32)
        out, scale = letterbox(img, (64, 64))
        assert out.shape == (64, 64, 3)
        assert scale == pytest.approx(0.64)

    def test_rotate_boxes_cover_object(self):
        img = np.zeros((64, 64, 3), np.float32)
        img[20:40, 20:40] = 255.0
        boxes = np.array([[20.0, 20.0, 40.0, 40.0]])
        out, nb = rotate_with_boxes(img, boxes, 45.0)
        ys, xs = np.nonzero(out[..., 0] > 50)
        assert nb[0, 0] <= xs.min() + 2 and nb[0, 2] >= xs.max() - 2

    def test_translate_boxes(self):
        img = np.zeros((32, 32, 3), np.float32)
        boxes = np.array([[4.0, 4.0, 10.0, 10.0]])
        _, nb = translate_with_boxes(img, boxes, 5.0, -2.0)
        np.testing.assert_allclose(nb[0], [9.0, 2.0, 15.0, 8.0])
