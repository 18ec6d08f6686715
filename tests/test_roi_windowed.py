"""Windowed MXU ROIAlign vs the exact gather implementation."""

import numpy as np
import pytest

import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.ops import roi_align as RA


class TestWindowedRoiAlign:
    def test_matches_exact_for_in_window_boxes(self):
        rng = np.random.default_rng(0)
        feat = jnp.asarray(rng.normal(size=(64, 80, 16)).astype(np.float32))
        # boxes whose feature extent (scale 1/4) fits well inside window=32
        boxes = jnp.asarray(
            np.array(
                [
                    [20.0, 16.0, 120.0, 100.0],   # ~25x21 feature px
                    [100.0, 40.0, 200.0, 160.0],  # 25x30
                    [4.0, 4.0, 60.0, 60.0],       # 14x14
                ],
                np.float32,
            )
        )
        exact = RA.roi_align(feat, boxes, 7, 0.25, sampling_ratio=2)
        fast = RA.roi_align_windowed(feat, boxes, 7, 0.25, sampling_ratio=2, window=32)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(exact), atol=1e-4)

    def test_border_box_zero_padding(self):
        rng = np.random.default_rng(1)
        feat = jnp.asarray(rng.normal(size=(32, 32, 4)).astype(np.float32))
        # box hanging off the image edge: outside taps must be zero
        boxes = jnp.asarray(np.array([[-20.0, -20.0, 40.0, 40.0]], np.float32))
        exact = RA.roi_align(feat, boxes, 7, 1.0, sampling_ratio=2)
        fast = RA.roi_align_windowed(feat, boxes, 7, 1.0, sampling_ratio=2, window=32)
        # extent is 60 feature px > window: only assert the in-window bins
        # (the top-left quadrant) match
        np.testing.assert_allclose(
            np.asarray(fast)[0, :3, :3], np.asarray(exact)[0, :3, :3], atol=1e-4
        )

    def test_multilevel_windowed_matches_gather(self):
        rng = np.random.default_rng(2)
        feats = [
            jnp.asarray(rng.normal(size=(64 // s, 64 // s, 8)).astype(np.float32))
            for s in (4, 8, 16, 32)
        ]
        boxes = jnp.asarray(
            np.array([[8.0, 8.0, 80.0, 88.0], [0.0, 0.0, 240.0, 240.0]], np.float32)
        )
        a = RA.multilevel_roi_align(feats, boxes, 7, (4, 8, 16, 32), impl="gather")
        b = RA.multilevel_roi_align(feats, boxes, 7, (4, 8, 16, 32), impl="windowed")
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)
