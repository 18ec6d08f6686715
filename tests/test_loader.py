"""Parallel host input pipeline (data/loader.py): determinism (parallel
== serial for the same seed), ordering, tail semantics, and actual
decode concurrency."""

import time

import numpy as np

from spacecraft_pose_estimation_tpu.data.loader import parallel_batches


def simple_stream(n_batches, batch_size):
    for b in range(n_batches):
        yield b, list(range(b * batch_size, (b + 1) * batch_size))


def collate(meta, exs):
    return {"meta": meta, "data": np.stack(exs)}


class TestParallelBatches:
    def test_matches_serial_and_order(self):
        make = lambda i: np.full((3,), i, np.float32)
        serial = list(
            parallel_batches(simple_stream(7, 4), make, collate, num_workers=0)
        )
        parallel = list(
            parallel_batches(simple_stream(7, 4), make, collate, num_workers=4)
        )
        assert len(serial) == len(parallel) == 7
        for s, p in zip(serial, parallel):
            assert s["meta"] == p["meta"]
            np.testing.assert_array_equal(s["data"], p["data"])

    def test_decode_overlaps(self):
        """4 workers on a sleep-bound 'decode' must beat serial time."""

        def slow(i):
            time.sleep(0.05)
            return np.float32(i)

        t0 = time.time()
        out = list(
            parallel_batches(
                simple_stream(4, 4), slow, collate, num_workers=4, prefetch_batches=2
            )
        )
        elapsed = time.time() - t0
        assert len(out) == 4
        # serial would be 16 * 0.05 = 0.8 s; 4 workers ~0.2 s + overhead
        assert elapsed < 0.6, elapsed

    def test_abandoned_iterator_shuts_down(self):
        make = lambda i: np.float32(i)
        it = parallel_batches(simple_stream(100, 8), make, collate, num_workers=2)
        next(it)
        it.close()  # must not hang or leak


class TestDatasetIterators:
    def test_landmark_batches_deterministic(self, tmp_path):
        import cv2

        from spacecraft_pose_estimation_tpu.data import coco_io
        from spacecraft_pose_estimation_tpu.data.landmark_dataset import (
            LandmarkExamples,
            batch_iterator,
        )

        rng = np.random.default_rng(0)
        imgdir = tmp_path / "imgs"
        imgdir.mkdir()
        images, annotations = [], []
        for i in range(10):
            img = rng.integers(0, 255, (32, 32, 3), np.uint8)
            cv2.imwrite(str(imgdir / f"{i}.png"), img)
            images.append({"file_name": f"{i}.png", "width": 32, "height": 32, "id": i})
            annotations.append({
                "image_id": i, "id": i, "category_id": 1,
                "bbox": [4, 4, 20, 20],
                "keypoints": [10, 10, 2, 20, 20, 2],
                "num_keypoints": 2,
            })
        coco = {
            "images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "spacecraft",
                            "keypoints": ["a", "b"], "skeleton": []}],
        }
        path = tmp_path / "train.json"
        coco_io.save_coco(coco, str(path))

        ex = LandmarkExamples(str(path), str(imgdir))
        a = [next(iter_) for iter_ in [batch_iterator(ex, 4, seed=3, num_workers=0)]
             for _ in range(3)]
        b_iter = batch_iterator(ex, 4, seed=3, num_workers=4)
        b = [next(b_iter) for _ in range(3)]
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x["image"], y["image"])
            np.testing.assert_array_equal(x["image_id"], y["image_id"])

    def test_device_cache_matches_host_path(self, tmp_path):
        """DeviceDatasetCache.gather + index_iterator must reproduce the
        batch_iterator stream bit-for-bit (same permutation rng; uint8
        frames hold the same integral values the host path casts to
        f32)."""
        import cv2

        from spacecraft_pose_estimation_tpu.data import coco_io
        from spacecraft_pose_estimation_tpu.data.landmark_dataset import (
            DeviceDatasetCache,
            LandmarkExamples,
            batch_iterator,
            index_iterator,
        )

        rng = np.random.default_rng(0)
        imgdir = tmp_path / "imgs"
        imgdir.mkdir()
        images, annotations = [], []
        for i in range(9):
            img = rng.integers(0, 255, (24, 28, 3), np.uint8)
            cv2.imwrite(str(imgdir / f"{i}.png"), img)
            images.append({"file_name": f"{i}.png", "width": 28, "height": 24, "id": i})
            annotations.append({
                "image_id": i, "id": i, "category_id": 1,
                "bbox": [2, 2, 20, 18],
                "keypoints": [5, 5, 2, 12, 14, 1],
                "num_keypoints": 2,
            })
        coco = {
            "images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "spacecraft",
                            "keypoints": ["a", "b"], "skeleton": []}],
        }
        path = tmp_path / "train.json"
        coco_io.save_coco(coco, str(path))

        ex = LandmarkExamples(str(path), str(imgdir))
        cache = DeviceDatasetCache(ex)
        host_iter = batch_iterator(ex, 4, seed=7, num_workers=0)
        idx_iter = index_iterator(len(ex), 4, seed=7)
        for _ in range(4):
            host = next(host_iter)
            imgs, bboxes, joints, vis = cache.gather(next(idx_iter))
            np.testing.assert_array_equal(
                np.asarray(imgs, np.float32), host["image"]
            )
            np.testing.assert_array_equal(np.asarray(bboxes), host["bbox"])
            np.testing.assert_array_equal(np.asarray(joints), host["joints"])
            np.testing.assert_array_equal(np.asarray(vis), host["joints_vis"])

    def test_detection_batches_deterministic(self, tmp_path):
        import cv2

        from spacecraft_pose_estimation_tpu.data import coco_io
        from spacecraft_pose_estimation_tpu.data.detection_dataset import (
            DetectionExamples,
            detection_batches,
        )

        rng = np.random.default_rng(1)
        imgdir = tmp_path / "imgs"
        imgdir.mkdir()
        images, annotations = [], []
        for i in range(8):
            img = rng.integers(0, 255, (48, 64, 3), np.uint8)
            cv2.imwrite(str(imgdir / f"{i}.png"), img)
            images.append({"file_name": f"{i}.png", "width": 64, "height": 48, "id": i})
            annotations.append({
                "image_id": i, "id": i, "category_id": 1,
                "bbox": [8, 8, 30, 24],
                "keypoints": [10, 10, 2], "num_keypoints": 1,
            })
        coco = {
            "images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "spacecraft",
                            "keypoints": ["a"], "skeleton": []}],
        }
        path = tmp_path / "d.json"
        coco_io.save_coco(coco, str(path))

        ex = DetectionExamples(str(path), str(imgdir))
        serial = detection_batches(ex, 4, (64, 64), seed=5, num_workers=0)
        par = detection_batches(ex, 4, (64, 64), seed=5, num_workers=4)
        for _ in range(4):
            s, p = next(serial), next(par)
            np.testing.assert_array_equal(s["image"], p["image"])
            np.testing.assert_array_equal(s["gt_boxes"], p["gt_boxes"])
            np.testing.assert_array_equal(s["image_id"], p["image_id"])
