"""Augmentation family: shape/range/statistical behavior tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.data import augment as A


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.uniform(0, 255, size=(64, 96, 3)).astype(np.float32))


def in_range(x):
    x = np.asarray(x)
    return np.isfinite(x).all() and x.min() >= 0.0 and x.max() <= 255.0


class TestBasics:
    def test_gaussian_blur_preserves_mean(self, img):
        out = A.gaussian_blur(img, 2.0, 13)
        assert abs(float(jnp.mean(out)) - float(jnp.mean(img))) < 2.0
        assert float(jnp.std(out)) < float(jnp.std(img))

    def test_fill_black(self):
        im = jnp.asarray([[[0.0, 0.0, 0.0], [200.0, 50.0, 20.0]]])
        out = A.fill_black(im)
        np.testing.assert_allclose(np.asarray(out[0, 0]), [127, 127, 127])
        np.testing.assert_allclose(np.asarray(out[0, 1]), [200, 50, 20])

    def test_event_noise_adds_salt(self, img):
        dark = jnp.zeros((64, 64, 3))
        out = A.event_noise(jax.random.key(1), dark, apply_prob=1.1)
        frac = float(jnp.mean(out == 255.0))
        assert 0.0005 < frac < 0.06
        assert in_range(out)

    def test_rotate_identity(self, img):
        out = A.rotate_about_center(img, 0.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=0.5)

    def test_rotate_matches_cv2(self, img):
        import cv2

        angle = 30.0
        M = cv2.getRotationMatrix2D((96 / 2, 64 / 2), angle, 1.0)
        ref = cv2.warpAffine(np.asarray(img), M, (96, 64), flags=cv2.INTER_LINEAR)
        out = A.rotate_about_center(img, angle)
        diff = np.abs(np.asarray(out) - ref)
        assert np.median(diff) < 1.0


class TestStochastic:
    @pytest.mark.parametrize(
        "fn",
        [
            A.event_noise,
            A.event_lines,
            A.random_stars,
            A.random_haze,
            A.random_flares,
            A.random_streaks,
            A.random_bloom,
            A.random_erasing,
        ],
    )
    def test_output_valid_and_shape(self, fn, img):
        out = fn(jax.random.key(0), img)
        assert out.shape == img.shape
        assert in_range(out)

    def test_stack_jits_and_vmaps(self, img):
        imgs = jnp.stack([img, img])
        keys = jax.random.split(jax.random.key(2), 2)
        fn = jax.jit(jax.vmap(lambda k, im: A.apply_stack(k, im, A.EVENT_STACK)))
        out = fn(keys, imgs)
        assert out.shape == imgs.shape
        assert in_range(out)
        # different keys -> different outputs
        assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))

    def test_noise_01(self):
        im = jnp.full((8, 8, 3), 0.5)
        out = A.random_noise_01(jax.random.key(3), im)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
        assert not np.allclose(np.asarray(out), 0.5)
