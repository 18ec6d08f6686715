"""Half-body crop augmentation vs a reference-faithful numpy oracle.

Oracle reimplements JointsDataset.half_body_transform
(/root/reference/landmark_regression/lib/dataset/JointsDataset.py:73-118)
and the gating at :155-162, with the two random draws (the normal
upper/lower coin and the uniform gate) passed in explicitly so both
implementations can be compared case by case.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.data.landmark_dataset import (
    apply_half_body,
    half_body_center_scale,
)

pytestmark = pytest.mark.smoke

PIXEL_STD = 200.0


def oracle_half_body(joints, joints_vis, coin, upper_ids, aspect_ratio):
    """Reference-faithful numpy version of JointsDataset.py:73-118."""
    num_joints = joints.shape[0]
    upper, lower = [], []
    for j in range(num_joints):
        if joints_vis[j] > 0:
            (upper if j in upper_ids else lower).append(joints[j])
    if coin < 0.5 and len(upper) > 2:
        selected = upper
    else:
        selected = lower if len(lower) > 2 else upper
    if len(selected) < 2:
        return None, None
    selected = np.array(selected, dtype=np.float32)
    center = selected.mean(axis=0)[:2]
    lt = np.amin(selected, axis=0)
    rb = np.amax(selected, axis=0)
    w = rb[0] - lt[0]
    h = rb[1] - lt[1]
    if w > aspect_ratio * h:
        h = w * 1.0 / aspect_ratio
    elif w < aspect_ratio * h:
        w = h * aspect_ratio
    scale = np.array([w / PIXEL_STD, h / PIXEL_STD], dtype=np.float32)
    return center, scale * 1.5


@pytest.mark.parametrize("seed", range(8))
def test_half_body_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    j = 12
    upper_ids = (0, 1, 2, 3, 4)
    aspect = 512.0 / 384.0
    upper_mask = np.zeros(j, np.float32)
    upper_mask[list(upper_ids)] = 1.0

    for case in range(25):
        joints = rng.uniform(0, 640, size=(j, 2)).astype(np.float32)
        # vary visibility from sparse to full to hit every branch,
        # including <2 selected (invalid) and the len<=2 fallbacks
        p_vis = rng.uniform(0.05, 1.0)
        vis = (rng.uniform(size=j) < p_vis).astype(np.float32)
        coin = float(rng.normal())

        valid, c, s = half_body_center_scale(
            jnp.asarray(joints), jnp.asarray(vis), jnp.float32(coin),
            jnp.asarray(upper_mask), aspect,
        )
        oc, os_ = oracle_half_body(joints, vis, coin, upper_ids, aspect)
        if oc is None:
            assert not bool(valid), f"case {case}: oracle invalid, ours valid"
        else:
            assert bool(valid), f"case {case}: oracle valid, ours invalid"
            np.testing.assert_allclose(np.asarray(c), oc, rtol=1e-5, atol=1e-4)
            np.testing.assert_allclose(np.asarray(s), os_, rtol=1e-5, atol=1e-4)


def test_gating_vis_count_and_prob():
    """JointsDataset.py:155-158: fires only when sum(vis) > NUM_JOINTS_HALF_BODY
    and uniform < PROB_HALF_BODY."""
    j = 12
    upper_ids = (0, 1, 2, 3, 4, 5)
    joints = np.tile(np.arange(j, dtype=np.float32)[:, None] * 13.0, (1, 2))
    joints = joints[None]  # batch 1
    centers = np.array([[100.0, 100.0]], np.float32)
    scales = np.array([[2.0, 2.0]], np.float32)

    # all visible, prob 1.0 -> replaced
    vis_all = np.ones((1, j), np.float32)
    c2, s2 = apply_half_body(
        jax.random.key(0), jnp.asarray(joints), jnp.asarray(vis_all),
        jnp.asarray(centers), jnp.asarray(scales),
        upper_ids, 1.0, num_joints_half_body=8, prob_half_body=1.0,
    )
    assert not np.allclose(np.asarray(c2), centers)

    # prob 0.0 -> never fires
    c3, s3 = apply_half_body(
        jax.random.key(0), jnp.asarray(joints), jnp.asarray(vis_all),
        jnp.asarray(centers), jnp.asarray(scales),
        upper_ids, 1.0, num_joints_half_body=8, prob_half_body=0.0,
    )
    np.testing.assert_array_equal(np.asarray(c3), centers)
    np.testing.assert_array_equal(np.asarray(s3), scales)

    # too few visible (count == threshold is NOT >) -> never fires
    vis_few = np.zeros((1, j), np.float32)
    vis_few[0, :8] = 1.0
    c4, s4 = apply_half_body(
        jax.random.key(0), jnp.asarray(joints), jnp.asarray(vis_few),
        jnp.asarray(centers), jnp.asarray(scales),
        upper_ids, 1.0, num_joints_half_body=8, prob_half_body=1.0,
    )
    np.testing.assert_array_equal(np.asarray(c4), centers)


def test_device_transform_halfbody_off_by_default():
    """Default config (prob 0.0 / no body split) must leave the crop
    geometry identical to the pre-half-body behavior."""
    from spacecraft_pose_estimation_tpu.data.landmark_dataset import device_transform

    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, size=(2, 64, 64, 3)).astype(np.float32)
    bboxes = np.array([[10, 10, 40, 30], [5, 20, 30, 30]], np.float32)
    joints = rng.uniform(10, 50, size=(2, 5, 2)).astype(np.float32)
    vis = np.ones((2, 5), np.float32)
    out_def = device_transform(
        jnp.asarray(images), jnp.asarray(bboxes), jnp.asarray(joints),
        jnp.asarray(vis), jax.random.key(3),
        image_size=(32, 32), heatmap_size=(8, 8), train=True,
    )
    out_hb = device_transform(
        jnp.asarray(images), jnp.asarray(bboxes), jnp.asarray(joints),
        jnp.asarray(vis), jax.random.key(3),
        image_size=(32, 32), heatmap_size=(8, 8), train=True,
        upper_body_ids=(0, 1, 2), prob_half_body=0.0,
    )
    np.testing.assert_array_equal(
        np.asarray(out_def["centers"]), np.asarray(out_hb["centers"])
    )
    np.testing.assert_array_equal(
        np.asarray(out_def["scales"]), np.asarray(out_hb["scales"])
    )
