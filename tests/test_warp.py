"""Affine warp vs cv2.warpAffine oracle."""

import cv2
import numpy as np
import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.ops import geometry as G
from spacecraft_pose_estimation_tpu.ops import warp as W


def cv2_crop(img, center, scale, rot, out_size):
    M = np.asarray(G.crop_affine_matrix(center, scale, rot, out_size))
    return cv2.warpAffine(
        img, M.astype(np.float64), out_size, flags=cv2.INTER_LINEAR
    )


class TestAffineWarp:
    def _img(self, rng, h=97, w=123):
        return rng.uniform(0, 255, size=(h, w, 3)).astype(np.float32)

    def test_identity_like_crop(self):
        rng = np.random.default_rng(0)
        img = self._img(rng)
        center = np.array([60.0, 48.0], np.float32)
        scale = np.array([0.32, 0.32], np.float32)  # 64 px box
        out = W.crop_and_resize(jnp.asarray(img), center, scale, 0.0, (64, 64))
        ref = cv2_crop(img, center, scale, 0.0, (64, 64))
        np.testing.assert_allclose(np.asarray(out), ref, atol=0.5)

    def test_rotated_crop(self):
        rng = np.random.default_rng(1)
        img = self._img(rng)
        center = np.array([61.5, 47.25], np.float32)
        scale = np.array([0.4, 0.4], np.float32)
        out = W.crop_and_resize(jnp.asarray(img), center, scale, 27.0, (48, 48))
        ref = cv2_crop(img, center, scale, 27.0, (48, 48))
        # interior pixels should match closely; allow edge tolerance
        diff = np.abs(np.asarray(out) - ref)
        assert np.median(diff) < 0.5
        assert (diff < 2.0).mean() > 0.97

    def test_out_of_bounds_zero_border(self):
        rng = np.random.default_rng(2)
        img = self._img(rng, 40, 40)
        center = np.array([0.0, 0.0], np.float32)  # box half outside
        scale = np.array([0.2, 0.2], np.float32)
        out = np.asarray(W.crop_and_resize(jnp.asarray(img), center, scale, 0.0, (40, 40)))
        ref = cv2_crop(img, center, scale, 0.0, (40, 40))
        np.testing.assert_allclose(out, ref, atol=0.5)
        assert out[0, 0].max() == 0.0  # fully outside corner is zero

    def test_batched(self):
        rng = np.random.default_rng(3)
        imgs = np.stack([self._img(rng, 64, 64) for _ in range(3)])
        centers = np.tile(np.array([[32.0, 32.0]], np.float32), (3, 1))
        scales = np.tile(np.array([[0.3, 0.3]], np.float32), (3, 1))
        rots = np.zeros(3, np.float32)
        out = W.batched_crop_and_resize(
            jnp.asarray(imgs), jnp.asarray(centers), jnp.asarray(scales), jnp.asarray(rots), (32, 32)
        )
        assert out.shape == (3, 32, 32, 3)
        ref0 = cv2_crop(imgs[0], centers[0], scales[0], 0.0, (32, 32))
        np.testing.assert_allclose(np.asarray(out[0]), ref0, atol=0.5)

    def test_mxu_path_matches_gather_and_cv2(self):
        rng = np.random.default_rng(5)
        img = self._img(rng, 120, 150)
        center = np.array([70.0, 55.0], np.float32)
        scale = np.array([0.45, 0.45], np.float32)
        mxu = W.crop_and_resize_mxu(jnp.asarray(img), jnp.asarray(center), jnp.asarray(scale), (64, 64))
        gather = W.crop_and_resize(jnp.asarray(img), center, scale, 0.0, (64, 64))
        ref = cv2_crop(img, center, scale, 0.0, (64, 64))
        np.testing.assert_allclose(np.asarray(mxu), np.asarray(gather), atol=1e-2)
        np.testing.assert_allclose(np.asarray(mxu), ref, atol=0.5)

    def test_mxu_zero_border(self):
        rng = np.random.default_rng(6)
        img = self._img(rng, 40, 40)
        center = np.array([0.0, 0.0], np.float32)
        scale = np.array([0.2, 0.2], np.float32)
        out = np.asarray(
            W.crop_and_resize_mxu(jnp.asarray(img), jnp.asarray(center), jnp.asarray(scale), (40, 40))
        )
        ref = cv2_crop(img, center, scale, 0.0, (40, 40))
        np.testing.assert_allclose(out, ref, atol=0.5)

    def test_batched_method_dispatch(self):
        rng = np.random.default_rng(7)
        imgs = np.stack([self._img(rng, 64, 64) for _ in range(2)])
        centers = np.tile(np.array([[32.0, 32.0]], np.float32), (2, 1))
        scales = np.tile(np.array([[0.3, 0.3]], np.float32), (2, 1))
        zeros = jnp.zeros(2)
        out_auto = W.batched_crop_and_resize(
            jnp.asarray(imgs), jnp.asarray(centers), jnp.asarray(scales), zeros, (32, 32)
        )
        out_gather = W.batched_crop_and_resize(
            jnp.asarray(imgs), jnp.asarray(centers), jnp.asarray(scales), zeros, (32, 32),
            method="gather",
        )
        np.testing.assert_allclose(np.asarray(out_auto), np.asarray(out_gather), atol=1e-2)

    def test_upsampling_crop(self):
        # crop smaller than output (zoom in)
        rng = np.random.default_rng(4)
        img = self._img(rng, 64, 64)
        center = np.array([30.0, 30.0], np.float32)
        scale = np.array([0.08, 0.08], np.float32)  # 16 px box -> 64 px out
        out = W.crop_and_resize(jnp.asarray(img), center, scale, 0.0, (64, 64))
        ref = cv2_crop(img, center, scale, 0.0, (64, 64))
        np.testing.assert_allclose(np.asarray(out), ref, atol=0.5)


class TestInt8Crop:
    def test_int8_close_to_f32(self):
        import numpy as np

        rng = np.random.default_rng(4)
        img = jnp.asarray(rng.integers(0, 255, (100, 140, 3)), jnp.uint8)
        center = jnp.asarray([70.0, 50.0])
        scale = jnp.asarray([0.4, 0.4])
        exact = W.crop_and_resize_mxu(img.astype(jnp.float32), center, scale, (64, 64))
        got = W.crop_and_resize_mxu(img, center, scale, (64, 64),
                                       compute_dtype=jnp.int8)
        err = float(jnp.max(jnp.abs(got - exact)))
        # worst case: tap quantization (~1 grey/axis) + intermediate
        # requant (+-0.5); the downstream int8 model's own input LSB is
        # ~2.2 grey, so <=4.5 grey is inside one input quantization bin
        assert err < 4.5, err
        mean_err = float(jnp.mean(jnp.abs(got - exact)))
        assert mean_err < 1.0, mean_err

    def test_int8_border_zero(self):
        import numpy as np

        img = jnp.full((60, 60, 3), 200, jnp.uint8)
        center = jnp.asarray([0.0, 0.0])  # crop hangs off the corner
        scale = jnp.asarray([0.3, 0.3])
        exact = W.crop_and_resize_mxu(img.astype(jnp.float32), center, scale, (32, 32))
        got = W.crop_and_resize_mxu(img, center, scale, (32, 32),
                                       compute_dtype=jnp.int8)
        assert float(jnp.max(jnp.abs(got - exact))) < 2.5
        # outside-the-image quadrant is (near) zero, not 128-shifted
        assert float(jnp.max(jnp.abs(got[:10, :10]))) < 1.5


class TestWindowedMxuCrop:
    """crop_and_resize_mxu_windowed == full-frame crop_and_resize_mxu
    exactly (f32) whenever the crop extent fits the window — including
    boxes at the frame border (both paths then sample the zero border)."""

    def test_matches_fullframe_exact(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.integers(0, 255, (120, 192, 3)), jnp.float32)
        cases = [
            (jnp.array([96.0, 60.0]), jnp.array([0.3, 0.25])),   # center
            (jnp.array([10.0, 12.0]), jnp.array([0.25, 0.25])),  # corner
            (jnp.array([180.0, 110.0]), jnp.array([0.3, 0.3])),  # far corner
            (jnp.array([96.0, 5.0]), jnp.array([0.2, 0.2])),     # top edge
        ]
        for center, scale in cases:
            full = W.crop_and_resize_mxu(img, center, scale, (64, 64))
            win = W.crop_and_resize_mxu_windowed(
                img, center, scale, (64, 64), window=80
            )
            # different contraction extents reassociate fp sums; 1e-2
            # grey levels is far below the bf16 serving path's own error
            np.testing.assert_allclose(np.asarray(win), np.asarray(full),
                                       rtol=1e-4, atol=1e-2)

    def test_pipeline_xla_window_matches_fullframe(self):
        """The serving pipeline's crop_window xla path reproduces the
        full-frame path bit-tight when boxes fit the window."""
        from spacecraft_pose_estimation_tpu.models.hrnet import HRNET_TINY, HRNet
        from spacecraft_pose_estimation_tpu.pipeline import (
            PipelineConfig,
            make_landmark_stage,
        )
        import dataclasses as dc

        import jax

        rng = np.random.default_rng(1)
        model = HRNet(config=dc.replace(HRNET_TINY, num_joints=4))
        variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
                               train=False)
        frames = jnp.asarray(rng.integers(0, 255, (2, 120, 192, 3)), jnp.uint8)
        boxes = jnp.asarray([[60.0, 30.0, 50.0, 40.0], [10.0, 8.0, 40.0, 36.0]])
        base = dict(image_size=(64, 64), solver="none", warp_dtype="float32")
        full = make_landmark_stage(model, PipelineConfig(**base))(
            variables, frames, boxes
        )
        windowed = make_landmark_stage(
            model, PipelineConfig(**base, crop_window=(96, 96),
                                  crop_window_impl="xla")
        )(variables, frames, boxes)
        np.testing.assert_allclose(np.asarray(windowed["keypoints"]),
                                   np.asarray(full["keypoints"]),
                                   rtol=1e-3, atol=0.05)
        np.testing.assert_allclose(np.asarray(windowed["confidence"]),
                                   np.asarray(full["confidence"]),
                                   rtol=1e-3, atol=1e-3)
