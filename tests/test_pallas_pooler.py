"""Pallas DMA ROI pooler: parity + RCNN integration (interpret on CPU)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.models.rcnn import RCNN_TINY, GeneralizedRCNN
from spacecraft_pose_estimation_tpu.models.roi_heads import ROIHeadsConfig
from spacecraft_pose_estimation_tpu.ops.pallas_pooler import (
    multilevel_roi_align_pallas,
    roi_align_pallas,
)
from spacecraft_pose_estimation_tpu.ops.roi_align import (
    multilevel_roi_align,
    roi_align_windowed,
)


def near_square_boxes(rng, n, size=240.0):
    xy = rng.uniform(0, size * 0.6, size=(n, 2)).astype(np.float32)
    s = rng.uniform(20, 90, size=(n, 1)).astype(np.float32)
    wh = s * rng.uniform(0.8, 1.25, size=(n, 2)).astype(np.float32)
    return np.concatenate([xy, xy + wh], axis=1)


class TestSingleLevel:
    def test_matches_windowed(self):
        rng = np.random.default_rng(0)
        feat = jnp.asarray(rng.normal(size=(64, 80, 16)).astype(np.float32))
        boxes = jnp.asarray(near_square_boxes(rng, 8, 200.0))
        a = roi_align_windowed(feat, boxes, 7, 0.25, 2, 40)
        b = roi_align_pallas(feat, boxes, 7, 0.25, 2, 32)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)


class TestMultiLevel:
    def test_matches_exact_gather_for_square_boxes(self):
        rng = np.random.default_rng(1)
        feats = tuple(
            jnp.asarray(rng.normal(size=(256 // s, 256 // s, 8)).astype(np.float32))
            for s in (4, 8, 16, 32)
        )
        boxes = jnp.asarray(near_square_boxes(rng, 12, 240.0))
        exact = multilevel_roi_align(list(feats), boxes, 7, (4, 8, 16, 32), impl="gather")
        fast = multilevel_roi_align_pallas(feats, boxes, 7, (4, 8, 16, 32), window=48)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(exact), atol=1e-4)


class TestRCNNWithPallasPooler:
    def test_inference_close_to_windowed(self):
        cfg = dataclasses.replace(
            RCNN_TINY,
            roi=dataclasses.replace(RCNN_TINY.roi, pooler_impl="pallas", pooler_window=32),
        )
        model_p = GeneralizedRCNN(config=cfg)
        model_w = GeneralizedRCNN(config=RCNN_TINY)
        images = jnp.asarray(
            np.random.default_rng(2).uniform(0, 255, (1, 64, 64, 3)), jnp.float32
        )
        v = model_p.init(
            {"params": jax.random.key(0), "sampling": jax.random.key(1)},
            images, train=False,
        )
        dets_p = model_p.apply(v, images, train=False)
        dets_w = model_w.apply(v, images, train=False)
        np.testing.assert_allclose(
            np.asarray(dets_p["scores"]), np.asarray(dets_w["scores"]), atol=1e-3
        )
