"""Catalog / env / logger utility tests."""

import logging
import os

import numpy as np
import pytest

from spacecraft_pose_estimation_tpu.data.catalog import (
    DatasetCatalog,
    MetadataCatalog,
    register_coco_instances,
)
from spacecraft_pose_estimation_tpu.utils.env import collect_env_info, seed_all_rng
from spacecraft_pose_estimation_tpu.utils.logger import create_output_tree, setup_logger


class TestCatalog:
    def teardown_method(self):
        DatasetCatalog.clear()
        MetadataCatalog.clear()

    def test_register_and_get(self):
        DatasetCatalog.register("d1", lambda: {"images": []})
        assert DatasetCatalog.get("d1") == {"images": []}
        assert "d1" in DatasetCatalog.list()
        with pytest.raises(KeyError):
            DatasetCatalog.register("d1", lambda: None)
        with pytest.raises(KeyError):
            DatasetCatalog.get("missing")

    def test_register_coco_instances(self, tmp_path):
        import json

        p = tmp_path / "x.json"
        p.write_text(json.dumps({"images": [], "annotations": [], "categories": []}))
        register_coco_instances("coco_x", str(p), str(tmp_path))
        d = DatasetCatalog.get("coco_x")
        assert d["images"] == []
        assert MetadataCatalog.get("coco_x").image_root == str(tmp_path)


class TestEnv:
    def test_seed_reproducible(self):
        seed_all_rng(123)
        a = np.random.rand(3)
        seed_all_rng(123)
        b = np.random.rand(3)
        np.testing.assert_array_equal(a, b)

    def test_random_seed_returned(self):
        s = seed_all_rng(None)
        assert 0 <= s < 2**31

    def test_collect_env(self):
        info = collect_env_info()
        assert "jax:" in info and "backend:" in info


class TestLogger:
    def test_file_logging(self, tmp_path):
        lg = setup_logger(str(tmp_path), name="spe_test_xyz")
        lg.info("hello world")
        for h in lg.handlers:
            h.flush()
        log = (tmp_path / "log.txt").read_text()
        assert "hello world" in log

    def test_output_tree(self, tmp_path):
        final, tb = create_output_tree(str(tmp_path), "events", "pose_hrnet", "cfg1")
        assert os.path.isdir(final) and os.path.isdir(tb)
        assert final.endswith(os.path.join("events", "pose_hrnet", "cfg1"))
