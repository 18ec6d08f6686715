"""Rotated IoU / NMS vs cv2.rotatedRectangleIntersection oracle."""

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.ops import rotated_boxes as RB


def cv2_iou(a, b):
    ra = ((a[0], a[1]), (a[2], a[3]), a[4])
    rb = ((b[0], b[1]), (b[2], b[3]), b[4])
    ret, pts = cv2.rotatedRectangleIntersection(ra, rb)
    inter = cv2.contourArea(pts) if pts is not None and len(pts) >= 3 else 0.0
    union = a[2] * a[3] + b[2] * b[3] - inter
    return inter / union if union > 0 else 0.0


def random_rboxes(rng, n):
    return np.stack(
        [
            rng.uniform(50, 150, n),
            rng.uniform(50, 150, n),
            rng.uniform(10, 80, n),
            rng.uniform(10, 80, n),
            rng.uniform(-90, 90, n),
        ],
        axis=1,
    ).astype(np.float32)


class TestRotatedIoU:
    def test_axis_aligned_case(self):
        a = jnp.asarray([50.0, 50.0, 20.0, 20.0, 0.0])
        b = jnp.asarray([60.0, 50.0, 20.0, 20.0, 0.0])
        # overlap 10x20=200, union 800-200=600
        got = float(RB.pairwise_iou_rotated(a[None], b[None])[0, 0])
        assert got == pytest.approx(200 / 600, abs=1e-4)

    def test_identical_rotated(self):
        a = jnp.asarray([50.0, 50.0, 30.0, 10.0, 37.0])
        assert float(RB.pairwise_iou_rotated(a[None], a[None])[0, 0]) == pytest.approx(1.0, abs=1e-4)

    def test_disjoint(self):
        a = jnp.asarray([10.0, 10.0, 5.0, 5.0, 15.0])
        b = jnp.asarray([100.0, 100.0, 5.0, 5.0, 70.0])
        assert float(RB.pairwise_iou_rotated(a[None], b[None])[0, 0]) == 0.0

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_cv2(self, seed):
        rng = np.random.default_rng(seed)
        a = random_rboxes(rng, 8)
        b = random_rboxes(rng, 6)
        got = np.asarray(RB.pairwise_iou_rotated(jnp.asarray(a), jnp.asarray(b)))
        for i in range(8):
            for j in range(6):
                assert got[i, j] == pytest.approx(cv2_iou(a[i], b[j]), abs=2e-3), (i, j)


class TestRotatedNMS:
    def test_suppresses_duplicates(self):
        rng = np.random.default_rng(3)
        base = random_rboxes(rng, 4)
        dup = base.copy()
        dup[:, :2] += rng.normal(0, 1.0, (4, 2))  # near-duplicates
        boxes = np.concatenate([base, dup])
        scores = np.concatenate([np.full(4, 0.9), np.full(4, 0.5)]).astype(np.float32)
        keep = np.asarray(
            RB.nms_rotated_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5)
        )
        assert keep[:4].all()
        assert not keep[4:].any()

    def test_oracle_greedy(self):
        rng = np.random.default_rng(4)
        boxes = random_rboxes(rng, 16)
        scores = rng.uniform(size=16).astype(np.float32)
        keep = np.asarray(RB.nms_rotated_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.4))
        # oracle
        order = np.argsort(-scores, kind="stable")
        suppressed = np.zeros(16, bool)
        kept = []
        for i in order:
            if suppressed[i]:
                continue
            kept.append(i)
            for j in order:
                if j != i and not suppressed[j] and cv2_iou(boxes[i], boxes[j]) > 0.4:
                    suppressed[j] = True
        np.testing.assert_array_equal(np.sort(np.nonzero(keep)[0]), np.sort(kept))
