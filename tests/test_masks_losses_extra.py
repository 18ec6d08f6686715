"""Mask ops, IoU-variant losses, ASPP, tracker tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.models.extra_layers import ASPP, IouTracker
from spacecraft_pose_estimation_tpu.ops import boxes as B
from spacecraft_pose_estimation_tpu.ops import masks as M


class TestIouLosses:
    def test_perfect_overlap_zero(self):
        b = jnp.asarray([[10.0, 10.0, 50.0, 50.0]])
        for fn in (B.giou_loss, B.diou_loss, B.ciou_loss):
            assert float(fn(b, b)[0]) == pytest.approx(0.0, abs=1e-5), fn.__name__

    def test_disjoint_giou_exceeds_one(self):
        a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
        b = jnp.asarray([[100.0, 100.0, 110.0, 110.0]])
        assert float(B.giou_loss(a, b)[0]) > 1.0
        assert float(B.diou_loss(a, b)[0]) > 1.0

    def test_losses_decrease_with_overlap(self):
        t = jnp.asarray([[0.0, 0.0, 20.0, 20.0]])
        near = jnp.asarray([[2.0, 2.0, 22.0, 22.0]])
        far = jnp.asarray([[15.0, 15.0, 35.0, 35.0]])
        for fn in (B.giou_loss, B.diou_loss, B.ciou_loss):
            assert float(fn(near, t)[0]) < float(fn(far, t)[0])

    def test_gradients_finite(self):
        t = jnp.asarray([[0.0, 0.0, 20.0, 20.0]])
        g = jax.grad(lambda p: jnp.sum(B.ciou_loss(p, t)))(jnp.asarray([[1.0, 1.0, 19.0, 21.0]]))
        assert np.isfinite(np.asarray(g)).all()


class TestMasks:
    def test_polygon_square(self):
        poly = jnp.asarray([[2.0, 2.0], [8.0, 2.0], [8.0, 8.0], [2.0, 8.0]])
        mask = M.polygon_to_bitmask(poly, 10, 10)
        m = np.asarray(mask)
        assert m[5, 5] and not m[0, 0] and not m[9, 9]
        assert m.sum() == 36  # pixel centers strictly inside [2,8)^2

    def test_paste_mask_full_box(self):
        mask = jnp.ones((4, 4))
        box = jnp.asarray([2.0, 2.0, 8.0, 8.0])
        out = np.asarray(M.paste_mask_in_image(mask, box, 12, 12, threshold=0.5))
        assert out[4, 4] and not out[0, 0]
        assert out.sum() == 36

    def test_paste_batched(self):
        masks = jnp.ones((2, 4, 4))
        boxes = jnp.asarray([[0.0, 0.0, 4.0, 4.0], [6.0, 6.0, 10.0, 10.0]])
        out = np.asarray(M.paste_masks_in_image(masks, boxes, 12, 12))
        assert out.shape == (2, 12, 12)
        assert out[0, 1, 1] and out[1, 8, 8] and not out[0, 8, 8]


class TestASPP:
    def test_shapes(self):
        m = ASPP(features=8, dilations=(2, 4))
        x = jnp.zeros((1, 16, 16, 4))
        v = m.init(jax.random.key(0), x)
        out = m.apply(v, x)
        assert out.shape == (1, 16, 16, 8)


class TestTracker:
    def test_track_continuity(self):
        tr = IouTracker(iou_threshold=0.3)
        ids0 = tr.update(np.array([[0, 0, 10, 10], [50, 50, 70, 70]]))
        assert ids0 == [0, 1]
        # both boxes move slightly -> same ids
        ids1 = tr.update(np.array([[2, 1, 12, 11], [52, 51, 72, 71]]))
        assert ids1 == ids0
        # a new object appears
        ids2 = tr.update(np.array([[2, 1, 12, 11], [100, 100, 120, 120]]))
        assert ids2[0] == ids0[0] and ids2[1] == 2

    def test_track_ageout(self):
        tr = IouTracker(iou_threshold=0.3, max_missed=0)
        tr.update(np.array([[0, 0, 10, 10]]))
        tr.update(np.array([[100, 100, 110, 110]]))  # original missed once -> dropped
        ids = tr.update(np.array([[0, 0, 10, 10]]))
        assert ids == [2]  # came back as a new track
