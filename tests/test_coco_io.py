"""COCO interchange contract tests (file-edge parity with the reference)."""

import json
import os

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from spacecraft_pose_estimation_tpu.data import coco_io
from spacecraft_pose_estimation_tpu.data.camera import CameraModel


class TestVisibility:
    def test_vis_2_inside_1_outside(self):
        pts = np.array([[10.0, 10.0], [-5.0, 10.0], [10.0, 1e4], [0.0, 10.0]])
        out = coco_io.visible_keypoints(pts, 100, 100)
        np.testing.assert_array_equal(out[:, 2], [2, 1, 1, 1])  # 0 is not >0

    def test_bbox_padding_uses_width_for_both_axes(self):
        pts = np.array([[0.0, 0.0], [100.0, 10.0]])
        box = coco_io.landmarks_bbox(pts)
        # width 100 -> tol 10 in BOTH axes (reference quirk)
        assert box == [-10.0, -10.0, 120.0, 30.0]


class TestConverters:
    def _scene(self):
        rng = np.random.default_rng(0)
        lm = rng.uniform(-1, 1, size=(11, 3))
        K = np.array([[800.0, 0, 640.0], [0, 800.0, 400.0], [0, 0, 1]])
        Rs = np.stack([Rotation.random(random_state=rng).as_matrix() for _ in range(3)])
        ts = np.tile(np.array([0.0, 0.0, 8.0]), (3, 1))
        return lm, K, Rs, ts

    def test_poses_to_coco_contract(self, tmp_path):
        lm, K, Rs, ts = self._scene()
        names = [f"{i}.png" for i in range(3)]
        coco = coco_io.poses_to_coco(names, Rs, ts, lm, K, width=1280, height=800)
        assert set(coco.keys()) == {"info", "licenses", "categories", "images", "annotations"}
        assert coco["categories"][0]["name"] == "spacecraft"
        assert coco["categories"][0]["keypoints"] == [f"p{i+1}" for i in range(11)]
        ann = coco["annotations"][0]
        assert len(ann["keypoints"]) == 33
        assert ann["category_id"] == 1
        assert ann["num_keypoints"] == 11
        assert ann["area"] == pytest.approx(ann["bbox"][2] * ann["bbox"][3])
        # round-trip through disk
        p = str(tmp_path / "x_train.json")
        coco_io.save_coco(coco, p)
        assert coco_io.load_coco(p) == json.loads(json.dumps(coco))

    def test_projection_matches_device_geometry(self):
        import jax.numpy as jnp

        from spacecraft_pose_estimation_tpu.ops import geometry as G

        lm, K, Rs, ts = self._scene()
        dist = np.array([-0.2, 0.1, 1e-3, -1e-3, 0.05])
        host = coco_io.project_landmarks(lm, Rs[0], ts[0], K, dist)
        dev = G.project_points(
            jnp.asarray(lm, jnp.float32), jnp.asarray(Rs[0], jnp.float32),
            jnp.asarray(ts[0], jnp.float32), jnp.asarray(K, jnp.float32),
            jnp.asarray(dist, jnp.float32),
        )
        np.testing.assert_allclose(np.asarray(dev), host, atol=1e-2)

    def test_coco_to_examples_vis_conversion(self):
        lm, K, Rs, ts = self._scene()
        coco = coco_io.poses_to_coco(["0.png"], Rs[:1], ts[:1], lm, K, 1280, 800)
        ex = coco_io.coco_to_examples(coco)[0]
        assert ex["joints"].shape == (11, 2)
        assert set(np.unique(ex["joints_vis"])) <= {0.0, 1.0}

    def test_detections_to_coco_dummy_keypoints(self):
        boxes = np.array([[10.0, 20.0, 110.0, 220.0]])
        coco = coco_io.detections_to_coco(["img000012.jpg"], boxes, 11, 1920, 1200)
        ann = coco["annotations"][0]
        assert ann["bbox"] == [10.0, 20.0, 100.0, 200.0]
        assert ann["keypoints"] == [2.0] * 33
        assert coco["images"][0]["id"] == 12

    def test_fallback_box(self):
        np.testing.assert_array_equal(
            coco_io.fallback_full_frame_box(640, 480), [0, 0, 640, 480]
        )


class TestMatAndPoses:
    def test_pred_mat_roundtrip(self, tmp_path):
        preds = np.random.default_rng(0).normal(size=(5, 11, 3)).astype(np.float32)
        p = str(tmp_path / "pred.mat")
        coco_io.save_pred_mat(preds, p)
        np.testing.assert_allclose(coco_io.load_pred_mat(p), preds)

    def test_opencv_poses_contract(self, tmp_path):
        rng = np.random.default_rng(1)
        Rs = np.stack([Rotation.random(random_state=rng).as_matrix() for _ in range(2)])
        ts = rng.normal(size=(2, 3))
        p = str(tmp_path / "opencv_poses.json")
        coco_io.save_opencv_poses(["a.png", "b.png"], Rs, ts, p)
        loaded = coco_io.load_opencv_poses(p)
        assert loaded[0]["image_name"] == "a.png"
        assert np.asarray(loaded[0]["T"]).shape == (3, 1)
        np.testing.assert_allclose(np.asarray(loaded[1]["rotation_matrix"]), Rs[1])


class TestSplit:
    def test_fractions(self):
        files = [f"{i}.png" for i in range(100)]
        split = coco_io.split_files(files, seed=0)
        assert len(split["train"]) == 70
        assert len(split["validation"]) == 15
        assert len(split["test"]) == 15
        assert set(sum(split.values(), [])) == set(files)


class TestCamera:
    def test_speedplus_json(self, tmp_path):
        p = tmp_path / "camera.json"
        p.write_text(json.dumps({
            "Nu": 1920, "Nv": 1200, "ppx": 5.86e-6, "ppy": 5.86e-6,
            "fx": 0.0175, "fy": 0.0175,
            "cameraMatrix": [[2988.6, 0, 960], [0, 2988.3, 600], [0, 0, 1]],
            "distCoeffs": [-0.22, 0.51, -6.6e-4, -2.1e-4, -0.13],
        }))
        cam = CameraModel.from_speedplus_json(str(p))
        assert cam.width == 1920 and cam.height == 1200
        assert cam.K[0, 0] == pytest.approx(2988.6)
        assert cam.dist.shape == (5,)

    def test_calibration_json(self, tmp_path):
        p = tmp_path / "calibration.json"
        p.write_text(json.dumps({
            "intrinsics": {
                "camera_matrix": [[600, 0, 320], [0, 600, 240], [0, 0, 1]],
                "distortion_coefficients": [0.1, -0.05, 0.001, 0.0, 0.0],
            }
        }))
        cam = CameraModel.from_calibration_json(str(p), 640, 480)
        assert cam.K[2, 2] == 1.0
        assert cam.dist[0] == pytest.approx(0.1)
