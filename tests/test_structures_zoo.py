"""Structures containers + detector preset registry tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.models.zoo import (
    DETECTOR_PRESETS,
    get_detector_preset,
)
from spacecraft_pose_estimation_tpu.structures import (
    Boxes,
    Instances,
    instances_from_detections,
)


class TestBoxes:
    def test_surface(self):
        b = Boxes(jnp.asarray([[0.0, 0.0, 10.0, 20.0], [5.0, 5.0, 5.0, 5.0]]))
        np.testing.assert_allclose(np.asarray(b.area()), [200.0, 0.0])
        assert np.asarray(b.nonempty()).tolist() == [True, False]
        assert len(b) == 2
        clipped = b.clip(8, 8)
        assert float(clipped.tensor.max()) <= 8.0

    def test_jit_passthrough(self):
        @jax.jit
        def f(b: Boxes):
            return b.area()

        out = f(Boxes(jnp.asarray([[0.0, 0.0, 2.0, 2.0]])))
        assert float(out[0]) == 4.0


class TestInstances:
    def test_fields_and_masking(self):
        inst = Instances.create(
            jnp.asarray([True, True, False]),
            boxes=jnp.ones((3, 4)),
            scores=jnp.asarray([0.9, 0.5, 0.1]),
        )
        assert int(inst.num_instances()) == 2
        np.testing.assert_allclose(np.asarray(inst.masked("scores")), [0.9, 0.5, 0.0])
        trimmed = inst.to_numpy()
        assert trimmed["scores"].shape == (2,)

    def test_mismatched_field_raises(self):
        with pytest.raises(ValueError):
            Instances.create(jnp.ones(3, bool), boxes=jnp.ones((2, 4)))

    def test_from_detections(self):
        dets = {
            "boxes": jnp.zeros((2, 4, 4)),
            "scores": jnp.zeros((2, 4)),
            "classes": jnp.zeros((2, 4), jnp.int32),
            "valid": jnp.asarray([[True, False, False, False]] * 2),
        }
        lst = instances_from_detections(dets)
        assert len(lst) == 2 and int(lst[0].num_instances()) == 1


class TestZoo:
    def test_presets_exist(self):
        for name in ("config_1", "config_2", "config_3", "config_4", "config_20"):
            assert name in DETECTOR_PRESETS

    def test_config4_pins_height(self):
        with pytest.raises(ValueError):
            get_detector_preset("config_4")
        p = get_detector_preset("config_4", image_height=720)
        assert p.input_size == 720
        assert p.flip is False
        assert p.config.roi.cls_agnostic_bbox_reg
        assert p.config.roi.detections_per_image == 2

    def test_config20_retinanet(self):
        p = get_detector_preset("config_20")
        assert p.arch == "retinanet"
        assert p.config.backbone.depth == 101
        # INPUT block commented out upstream -> d2 default RANDOM_FLIP
        # "horizontal" (defaults.py:68)
        assert p.flip is True

    def test_solver_presets_match_registry(self):
        """Each preset carries the reference registry's exact SOLVER/TEST
        block (object_detection_utils.py config_N bodies)."""
        expect = {
            "config_1": (5000, 0.001, 4, 500, (500, 800, 1000, 1100, 1200), 0.05, 1000),
            "config_2": (10000, 0.001, 8, 200, (2000, 6000, 8000), 0.1, 2000),
            "config_3": (15000, 0.0001, 7, 500, (10000,), 0.1, 5000),
            "config_4": (10000, 0.0001, 10, 500, (8000,), 0.1, 5000),
            "config_20": (20000, 0.0001, 10, 500, (6000, 10000, 15000), 0.1, 10000),
        }
        for name, (mi, lr, ims, wu, steps, gamma, ep) in expect.items():
            s = DETECTOR_PRESETS[name].solver
            assert (s.max_iter, s.base_lr, s.ims_per_batch, s.warmup_iters,
                    s.steps, s.gamma, s.eval_period) == (mi, lr, ims, wu, steps, gamma, ep)
            assert s.checkpoint_period == 500
