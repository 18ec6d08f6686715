"""Windowed DMA crop (ops/pallas_crop.py) vs the full-frame reference
paths — interpret mode on CPU; the kernel semantics are identical on TPU
because the tap matrices are built against the same rounded origins."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spacecraft_pose_estimation_tpu.ops import pallas_crop, warp
from spacecraft_pose_estimation_tpu.ops.geometry import PIXEL_STD

pytestmark = pytest.mark.smoke


@pytest.fixture
def rng():
    return np.random.default_rng(1)


def _frames(rng, b=3, h=200, w=320):
    return jnp.asarray(rng.integers(0, 255, (b, h, w, 3)), jnp.uint8)


def test_windowed_matches_fullframe(rng):
    frames = _frames(rng)
    # boxes safely inside the coverage of a (160, 256) window
    centers = jnp.asarray([[160.0, 100.0], [80.0, 60.0], [250.0, 150.0]], jnp.float32)
    side = 90.0
    scales = jnp.full((3, 2), side / PIXEL_STD, jnp.float32)
    window = (160, 256)

    got = pallas_crop.crop_and_resize_window(
        frames, centers, scales, (64, 64), window, compute_dtype=jnp.float32
    )
    want = jax.vmap(
        lambda im, c, s: warp.crop_and_resize_mxu(im, c, s, (64, 64))
    )(frames.astype(jnp.float32), centers, scales)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)


def test_windowed_near_border_zero_padding(rng):
    """Crop box hanging off the frame edge: outside samples are zero
    (cv2 BORDER_CONSTANT semantics), exactly like the full-frame path."""
    frames = _frames(rng)
    centers = jnp.asarray([[6.0, 4.0], [316.0, 196.0], [160.0, 2.0]], jnp.float32)
    scales = jnp.full((3, 2), 80.0 / PIXEL_STD, jnp.float32)
    window = (160, 256)
    got = pallas_crop.crop_and_resize_window(
        frames, centers, scales, (48, 48), window, compute_dtype=jnp.float32
    )
    want = jax.vmap(
        lambda im, c, s: warp.crop_and_resize_mxu(im, c, s, (48, 48))
    )(frames.astype(jnp.float32), centers, scales)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)
    assert float(jnp.max(got)) > 0


def test_clamp_scales():
    window = (160, 256)
    cov_h, cov_w = pallas_crop.window_coverage(window)
    scales = jnp.asarray([[2.0, 2.0], [0.3, 0.25]], jnp.float32)
    clamped = pallas_crop.clamp_scales_to_window(scales, (64, 64), window)
    # oversized row: shrunk to the coverage bound (square crop, dst square)
    assert float(clamped[0, 0]) * PIXEL_STD <= min(cov_h, cov_w) + 1e-4
    # aspect preserved
    np.testing.assert_allclose(
        np.asarray(clamped[0, 1] / clamped[0, 0]), 1.0, rtol=1e-6
    )
    # in-bounds row untouched
    np.testing.assert_allclose(np.asarray(clamped[1]), np.asarray(scales[1]))


def test_bf16_compute_close(rng):
    frames = _frames(rng)
    centers = jnp.asarray([[160.0, 100.0]] * 3, jnp.float32)
    scales = jnp.full((3, 2), 100.0 / PIXEL_STD, jnp.float32)
    window = (160, 256)
    got = pallas_crop.crop_and_resize_window(
        frames, centers, scales, (64, 64), window, compute_dtype=jnp.bfloat16
    )
    want = jax.vmap(
        lambda im, c, s: warp.crop_and_resize_mxu(im, c, s, (64, 64))
    )(frames.astype(jnp.float32), centers, scales)
    # bf16 taps: error <= ~1 grey level on 0..255 data
    assert float(jnp.max(jnp.abs(got - want))) < 2.0


def test_hcontract_mode_matches_copy_mode(rng):
    """mode='hcontract' (in-kernel H contraction) == mode='copy' to bf16
    tap rounding."""
    frames = _frames(rng)
    centers = jnp.asarray([[160.0, 100.0], [80.0, 60.0], [250.0, 150.0]], jnp.float32)
    scales = jnp.full((3, 2), 90.0 / PIXEL_STD, jnp.float32)
    window = (160, 256)
    a = pallas_crop.crop_and_resize_window(
        frames, centers, scales, (64, 64), window, compute_dtype=jnp.bfloat16,
        mode="hcontract",
    )
    b = pallas_crop.crop_and_resize_window(
        frames, centers, scales, (64, 64), window, compute_dtype=jnp.bfloat16,
        mode="copy",
    )
    assert float(jnp.max(jnp.abs(a - b))) < 2.0
    ref = jax.vmap(
        lambda im, c, s: warp.crop_and_resize_mxu(im, c, s, (64, 64))
    )(frames.astype(jnp.float32), centers, scales)
    assert float(jnp.max(jnp.abs(a - ref))) < 2.5


def test_windowed_nonsquare_out_matches_fullframe(rng):
    """out_h > out_w: the source crop's y extent is side*out_h/out_w, so
    the DMA window's y origin must anchor on that taller extent
    (regression: anchoring on the square side left the top rows of the
    window short and the crop came back with a zero band)."""
    frames = _frames(rng, b=2, h=600, w=320)
    centers = jnp.asarray([[160.0, 300.0], [150.0, 280.0]], jnp.float32)
    side = 140.0
    scales = jnp.full((2, 2), side / PIXEL_STD, jnp.float32)
    window = (288, 256)
    out_size = (48, 72)  # (width, height): y extent = side * 1.5 = 210

    got = pallas_crop.crop_and_resize_window(
        frames, centers, scales, out_size, window, compute_dtype=jnp.float32
    )
    want = jax.vmap(
        lambda im, c, s: warp.crop_and_resize_mxu(im, c, s, out_size)
    )(frames.astype(jnp.float32), centers, scales)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)
    # the top rows must carry real data, not the zero band
    assert float(jnp.max(got[:, :8])) > 0
