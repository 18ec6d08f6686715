"""Degenerate-input e2e: the fused pipeline must emit FINITE poses when
frames contain no visible target (VERDICT r4 #8).

The reference pipeline degrades gracefully at both stages — zero
detections fall back to a full-frame box
(export_object_detection_bounding_boxes.py:313-320) and the PnP stage's
adaptive confidence loop bottoms out at "all positive-confidence points"
(export_predicted_poses_real.py:187-197) with cv2.solvePnPRansac always
returning a finite pose. This is the fused-graph equivalent: blank /
noise frames + degenerate boxes through make_pose_pipeline with both
solvers, asserting all-finite keypoints, R, t, quat.

Micro-tier: HRNET_TINY at 64^2, one jit per solver (the batch carries
all degenerate cases at once) keeps this under ~30 s on a 1-vCPU host.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.models.hrnet import HRNET_TINY, HRNet
from spacecraft_pose_estimation_tpu.pipeline import PipelineConfig, make_pose_pipeline

J = 12
H, W = 96, 128


def _scene():
    rng = np.random.default_rng(0)
    lm3d = rng.uniform(-0.5, 0.5, size=(J, 3)).astype(np.float32)
    K = np.array([[120.0, 0, W / 2], [0, 120.0, H / 2], [0, 0, 1]], np.float32)
    dist = np.zeros(5, np.float32)
    return lm3d, K, dist


@pytest.mark.parametrize("solver", ["gn", "ransac"])
def test_degenerate_frames_finite(solver):
    model = HRNet(config=HRNET_TINY.with_joints(J))
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    lm3d, K, dist = _scene()
    run = make_pose_pipeline(
        model, lm3d, K, dist,
        PipelineConfig(image_size=(64, 64), solver=solver,
                       ransac_hypotheses=16, refine_iters=2),
    )
    rng = np.random.default_rng(1)
    frames = jnp.asarray(
        np.stack([
            np.zeros((H, W, 3)),                      # all-black, no target
            rng.uniform(0, 255, (H, W, 3)),           # pure noise
            np.zeros((H, W, 3)),                      # black + 1-px box below
        ]),
        jnp.float32,
    )
    boxes = jnp.asarray(
        [
            [0.0, 0.0, W, H],       # full-frame fallback box
            [0.0, 0.0, W, H],
            [63.0, 40.0, 1.0, 1.0],  # near-degenerate box
        ],
        jnp.float32,
    )
    out = jax.jit(run)(variables, frames, boxes)
    for k in ("keypoints", "confidence", "R", "t", "quat"):
        arr = np.asarray(out[k])
        assert np.isfinite(arr).all(), f"non-finite {k}: {arr}"
