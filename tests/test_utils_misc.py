"""Vis / analysis / TTA / multihost / zipreader utility tests."""

import dataclasses
import os
import zipfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.models.hrnet import HRNET_TINY, HRNet
from spacecraft_pose_estimation_tpu.models.tta import flip_boxes, make_tta_inference
from spacecraft_pose_estimation_tpu.parallel import multihost
from spacecraft_pose_estimation_tpu.utils import analysis, vis, zipreader


class TestVis:
    def test_joint_grid(self, tmp_path):
        imgs = np.random.default_rng(0).uniform(0, 255, (3, 32, 32, 3))
        joints = np.random.default_rng(1).uniform(0, 31, (3, 5, 2))
        vis_w = np.ones((3, 5))
        p = str(tmp_path / "grid.jpg")
        vis.save_batch_image_with_joints(imgs, joints, vis_w, p)
        assert os.path.exists(p)

    def test_heatmap_grid(self, tmp_path):
        imgs = np.random.default_rng(0).uniform(0, 255, (2, 32, 32, 3))
        hms = np.random.default_rng(1).uniform(0, 1, (2, 8, 8, 4))
        p = str(tmp_path / "hm.jpg")
        vis.save_batch_heatmaps(imgs, hms, p)
        assert os.path.exists(p)

    def test_draw_detections(self):
        img = np.zeros((64, 64, 3), np.uint8)
        out = vis.draw_detections(img, np.array([[5, 5, 30, 30]]), np.array([0.9]))
        assert out.sum() > 0

    def test_video_visualizer_stable_track_colors(self):
        vv = vis.VideoVisualizer(iou_threshold=0.3)
        img = np.zeros((64, 64, 3), np.uint8)
        # same object drifting across 3 frames keeps one track id; a far
        # new object gets a different id
        _, ids0 = vv.draw_frame(img, np.array([[5.0, 5, 30, 30]]), np.array([0.9]))
        _, ids1 = vv.draw_frame(img, np.array([[7.0, 6, 32, 31]]), np.array([0.9]))
        out, ids2 = vv.draw_frame(
            img,
            np.array([[9.0, 7, 34, 32], [40.0, 40, 60, 60]]),
            np.array([0.9, 0.8]),
        )
        assert ids0[0] == ids1[0] == ids2[0]
        assert ids2[1] != ids2[0]
        assert vv.color_for(ids2[1]) != vv.color_for(ids2[0])
        assert out.sum() > 0


class TestAnalysis:
    def test_param_count_and_table(self):
        model = HRNet(config=dataclasses.replace(HRNET_TINY, num_joints=2))
        v = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=False)
        n = analysis.parameter_count(v["params"])
        assert n > 1000
        table = analysis.parameter_count_table(v["params"])
        assert "TOTAL" in table and f"{n:,d}" in table

    def test_flops(self):
        def f(x):
            return x @ x

        cost = analysis.flops_of(f, jnp.zeros((64, 64)))
        assert cost.get("flops", 0) >= 2 * 64**3 * 0.9


class TestTTA:
    def test_flip_boxes(self):
        b = jnp.asarray([[10.0, 5.0, 30.0, 25.0]])
        out = np.asarray(flip_boxes(b, 100.0))
        np.testing.assert_allclose(out, [[70.0, 5.0, 90.0, 25.0]])

    def test_tta_merges_views(self):
        # fake detector: one box at fixed location regardless of input
        def infer(images):
            b = images.shape[0]
            box = jnp.asarray([10.0, 10.0, 30.0, 30.0])
            return {
                "boxes": jnp.tile(box, (b, 2, 1)),
                "scores": jnp.tile(jnp.asarray([0.9, 0.0]), (b, 1)),
                "classes": jnp.zeros((b, 2), jnp.int32),
                "valid": jnp.tile(jnp.asarray([True, False]), (b, 1)),
            }

        tta = make_tta_inference(infer, scales=(1.0,), flip=True, max_dets=4)
        out = tta(jnp.zeros((1, 64, 64, 3)))
        v = np.asarray(out["valid"][0])
        boxes = np.asarray(out["boxes"][0][v])
        # original box + flipped-unmapped box (64-30, 64-10) survive NMS
        assert v.sum() == 2
        assert {tuple(np.round(b)) for b in boxes} == {
            (10.0, 10.0, 30.0, 30.0), (34.0, 10.0, 54.0, 30.0),
        }


class TestMultihost:
    def test_single_process_degradation(self):
        assert multihost.get_world_size() == 1
        assert multihost.is_main_process()
        assert multihost.all_gather_objects({"a": 1}) == [{"a": 1}]
        assert multihost.reduce_dict({"x": 2.0}) == {"x": 2.0}


class TestZipReader:
    def test_read_from_zip(self, tmp_path):
        import cv2

        img = np.random.default_rng(0).integers(0, 255, (16, 16, 3)).astype(np.uint8)
        png = cv2.imencode(".png", img)[1].tobytes()
        zpath = str(tmp_path / "a.zip")
        with zipfile.ZipFile(zpath, "w") as z:
            z.writestr("x/img.png", png)
        out = zipreader.imread(f"{zpath}@x/img.png")
        np.testing.assert_array_equal(out, img)
        zipreader.close_all()


class TestFileIO:
    def test_local_roundtrip(self, tmp_path):
        from spacecraft_pose_estimation_tpu.utils.file_io import PathManager

        p = str(tmp_path / "sub" / "x.txt")
        with PathManager.open(p, "w") as f:  # mkdirs on write
            f.write("hello")
        assert PathManager.exists(p) and PathManager.isfile(p)
        with PathManager.open(p) as f:
            assert f.read() == "hello"
        assert PathManager.ls(str(tmp_path / "sub")) == ["x.txt"]

    def test_zip_scheme(self, tmp_path):
        import zipfile

        from spacecraft_pose_estimation_tpu.utils.file_io import PathManager

        arch = str(tmp_path / "a.zip")
        with zipfile.ZipFile(arch, "w") as z:
            z.writestr("inner/data.txt", "zipped")
        uri = f"zip://{arch}!inner/data.txt"
        assert PathManager.exists(uri)
        with PathManager.open(uri) as f:
            assert f.read() == "zipped"
        assert not PathManager.exists(f"zip://{arch}!missing")

    def test_spe_scheme(self):
        from spacecraft_pose_estimation_tpu.utils.file_io import PathManager

        assert PathManager.exists("spe://utils/file_io.py")
        local = PathManager.get_local_path("spe://utils/file_io.py")
        assert local.endswith("utils/file_io.py")


class TestSerialize:
    def test_picklable_wrapper_lambda(self):
        import pickle

        from spacecraft_pose_estimation_tpu.utils.serialize import PicklableWrapper

        w = PicklableWrapper(lambda x: x * 3)
        w2 = pickle.loads(pickle.dumps(w))
        assert w2(7) == 21

    def test_robust_dumps_closure(self):
        from spacecraft_pose_estimation_tpu.utils.serialize import (
            robust_dumps,
            robust_loads,
        )

        k = 5
        fn = robust_loads(robust_dumps(lambda x: x + k))
        assert fn(1) == 6


class TestCollectEnv:
    def test_report_has_core_rows(self):
        from spacecraft_pose_estimation_tpu.utils.collect_env import collect_env_info

        info = collect_env_info()
        for key in ("jax", "numpy", "Python", "devices"):
            assert key in info, info
