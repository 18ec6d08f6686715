"""Serialized-export roundtrip + detector learning sanity."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.models.hrnet import HRNET_TINY, HRNet
from spacecraft_pose_estimation_tpu.models.rcnn import RCNN_TINY, GeneralizedRCNN
from spacecraft_pose_estimation_tpu.pipeline import PipelineConfig, make_pose_pipeline
from spacecraft_pose_estimation_tpu.train.detection_state import (
    DetTrainState,
    make_detection_train_step,
)
from spacecraft_pose_estimation_tpu.train.optim import build_optimizer


class TestExport:
    @pytest.mark.slow
    def test_stablehlo_roundtrip(self):
        model = HRNet(config=dataclasses.replace(HRNET_TINY, num_joints=8))
        variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)
        rng = np.random.default_rng(0)
        lm3d = rng.normal(size=(8, 3)).astype(np.float32)
        K = np.array([[200.0, 0, 70.0], [0, 200.0, 50.0], [0, 0, 1]], np.float32)
        run = make_pose_pipeline(
            model, lm3d, K, np.zeros(5, np.float32),
            PipelineConfig(image_size=(64, 64), solver="gn", refine_iters=2,
                           warp_dtype="float32"),
        )

        def serving_fn(frames, boxes):
            out = run(variables, frames, boxes)
            return out["keypoints"], out["R"], out["t"]

        frames_spec = jax.ShapeDtypeStruct((2, 100, 140, 3), jnp.float32)
        boxes_spec = jax.ShapeDtypeStruct((2, 4), jnp.float32)
        exported = jax.export.export(jax.jit(serving_fn))(frames_spec, boxes_spec)
        blob = exported.serialize()
        assert len(blob) > 1000

        reloaded = jax.export.deserialize(blob)
        frames = jnp.asarray(rng.uniform(0, 255, (2, 100, 140, 3)), jnp.float32)
        boxes = jnp.asarray([[20.0, 20.0, 60.0, 50.0]] * 2)
        out_direct = serving_fn(frames, boxes)
        out_loaded = reloaded.call(frames, boxes)
        # keypoints are numerically stable; compare exactly
        np.testing.assert_allclose(
            np.asarray(out_direct[0]), np.asarray(out_loaded[0]), atol=1e-3
        )
        # the GN pose refinement on an untrained net is chaotic — check
        # validity (orthonormal R) rather than bitwise equality
        R = np.asarray(out_loaded[1])
        np.testing.assert_allclose(
            np.einsum("bij,bik->bjk", R, R), np.tile(np.eye(3), (2, 1, 1)), atol=1e-4
        )


class TestDetectorLearning:
    @pytest.mark.slow
    def test_loss_decreases_on_fixed_batch(self):
        model = GeneralizedRCNN(config=RCNN_TINY)
        variables = model.init(
            {"params": jax.random.key(0), "sampling": jax.random.key(1)},
            jnp.zeros((1, 64, 64, 3)),
            train=False,
        )
        state = DetTrainState.create(
            model, variables,
            build_optimizer("sgd", 1e-3, momentum=0.9, grad_clip_norm=1.0),
        )
        rng = np.random.default_rng(0)
        # bright square on dark background as the object
        images = np.zeros((2, 64, 64, 3), np.float32)
        images[:, 16:44, 20:48] = 200.0
        batch = {
            "image": jnp.asarray(images),
            "gt_boxes": jnp.asarray([[[20.0, 16.0, 48.0, 44.0]]] * 2),
            "gt_classes": jnp.zeros((2, 1), jnp.int32),
            "gt_valid": jnp.ones((2, 1), bool),
        }
        step = jax.jit(make_detection_train_step())
        losses = []
        for i in range(12):
            state, m = step(state, batch, jax.random.key(i))
            losses.append(float(m["loss_total"]))
        assert np.isfinite(losses).all()
        assert min(losses[-3:]) < losses[0], losses
