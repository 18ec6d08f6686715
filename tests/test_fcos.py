"""FCOS anchor-free detector tests (tiny config)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.models.fcos import FCOS, FCOS_TINY


@pytest.fixture(scope="module")
def model_and_vars():
    model = FCOS(config=FCOS_TINY)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)
    return model, variables


class TestFCOS:
    def test_inference(self, model_and_vars):
        model, v = model_and_vars
        images = jnp.asarray(
            np.random.default_rng(0).uniform(0, 255, (2, 64, 64, 3)), jnp.float32
        )
        dets = model.apply(v, images, train=False)
        assert dets["boxes"].shape == (2, 4, 4)
        assert np.isfinite(np.asarray(dets["boxes"])).all()

    def test_train_losses(self, model_and_vars):
        model, v = model_and_vars
        losses = model.apply(
            v, jnp.zeros((2, 64, 64, 3)),
            gt_boxes=jnp.asarray([[[4.0, 4.0, 44.0, 44.0]]] * 2),
            gt_classes=jnp.zeros((2, 1), jnp.int32),
            gt_valid=jnp.ones((2, 1), bool),
            train=True,
        )
        for k in ("loss_cls", "loss_box_reg", "loss_centerness", "loss_total"):
            assert np.isfinite(float(losses[k])), k

    def test_empty_gt(self, model_and_vars):
        model, v = model_and_vars
        losses = model.apply(
            v, jnp.zeros((1, 64, 64, 3)),
            gt_boxes=jnp.zeros((1, 2, 4)),
            gt_classes=jnp.zeros((1, 2), jnp.int32),
            gt_valid=jnp.zeros((1, 2), bool),
            train=True,
        )
        assert np.isfinite(float(losses["loss_total"]))
