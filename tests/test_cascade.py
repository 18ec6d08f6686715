"""Cascade / mask / keypoint ROI head tests."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.models.cascade import (
    CascadeConfig,
    CascadeROIHeads,
    KeypointHead,
    MaskHead,
    keypoint_loss,
    mask_loss,
)
from spacecraft_pose_estimation_tpu.models.roi_heads import ROIHeadsConfig


def tiny_feats(rng, b=1):
    return {
        f"p{i + 2}": jnp.asarray(
            rng.normal(size=(b, 32 // 2**i, 32 // 2**i, 8)).astype(np.float32)
        )
        for i in range(4)
    }


class TestCascade:
    def test_stage_refinement_shapes(self):
        rng = np.random.default_rng(0)
        cfg = CascadeConfig(
            base=ROIHeadsConfig(num_classes=1, cls_agnostic_bbox_reg=True, fc_dim=16,
                                in_levels=("p2", "p3", "p4", "p5"))
        )
        m = CascadeROIHeads(config=cfg)
        feats = tiny_feats(rng)
        boxes = jnp.asarray([[[4.0, 4.0, 30.0, 30.0], [10.0, 10.0, 60.0, 60.0]]])
        strides = {"p2": 4, "p3": 8, "p4": 16, "p5": 32}
        v = m.init(jax.random.key(0), feats, boxes, strides, (128, 128))
        scores, out_boxes = m.apply(v, feats, boxes, strides, (128, 128))
        assert scores.shape == (1, 2, 2)
        assert out_boxes.shape == (1, 2, 4)
        assert np.isfinite(np.asarray(out_boxes)).all()
        # boxes stay clipped
        assert np.asarray(out_boxes).min() >= 0.0


class TestMaskHead:
    def test_shapes_and_loss(self):
        rng = np.random.default_rng(1)
        m = MaskHead(num_classes=2, conv_dim=8, num_convs=1)
        pooled = jnp.asarray(rng.normal(size=(3, 14, 14, 8)).astype(np.float32))
        v = m.init(jax.random.key(0), pooled)
        logits = m.apply(v, pooled)
        assert logits.shape == (3, 28, 28, 2)
        gt = jnp.asarray((rng.uniform(size=(3, 28, 28)) > 0.5).astype(np.float32))
        loss = mask_loss(logits, gt, jnp.zeros(3, jnp.int32), jnp.ones(3))
        assert np.isfinite(float(loss)) and float(loss) > 0


class TestKeypointHead:
    def test_shapes_and_loss(self):
        rng = np.random.default_rng(2)
        m = KeypointHead(num_keypoints=4, conv_dim=8, num_convs=1)
        pooled = jnp.asarray(rng.normal(size=(2, 14, 14, 8)).astype(np.float32))
        v = m.init(jax.random.key(0), pooled)
        logits = m.apply(v, pooled)
        assert logits.shape == (2, 56, 56, 4)
        idx = jnp.asarray(rng.integers(0, 56 * 56, size=(2, 4)), jnp.int32)
        loss = keypoint_loss(logits, idx, jnp.ones((2, 4)), jnp.ones(2))
        assert np.isfinite(float(loss)) and float(loss) > 0
