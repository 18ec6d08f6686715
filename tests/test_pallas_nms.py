"""Pallas NMS kernel vs the XLA mask NMS (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.ops import nms as N
from spacecraft_pose_estimation_tpu.ops.pallas_nms import nms_mask_pallas


def random_boxes(rng, n, size=200.0):
    xy = rng.uniform(0, size, size=(n, 2))
    wh = rng.uniform(1, size / 2, size=(n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


class TestPallasNMS:
    @pytest.mark.parametrize("seed", [0, 1])
    @pytest.mark.parametrize("thr", [0.3, 0.6])
    def test_matches_xla_nms(self, seed, thr):
        rng = np.random.default_rng(seed)
        boxes = random_boxes(rng, 128)
        scores = rng.uniform(size=128).astype(np.float32)
        ref = np.asarray(N.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), thr))
        got = np.asarray(nms_mask_pallas(jnp.asarray(boxes), jnp.asarray(scores), thr))
        np.testing.assert_array_equal(got, ref)

    def test_respects_valid_mask(self):
        rng = np.random.default_rng(2)
        boxes = random_boxes(rng, 64)
        scores = rng.uniform(size=64).astype(np.float32)
        valid = np.ones(64, bool)
        valid[40:] = False
        ref = np.asarray(
            N.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5, jnp.asarray(valid))
        )
        got = np.asarray(
            nms_mask_pallas(jnp.asarray(boxes), jnp.asarray(scores), 0.5, jnp.asarray(valid))
        )
        np.testing.assert_array_equal(got, ref)
