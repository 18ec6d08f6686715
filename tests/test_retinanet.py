"""RetinaNet e2e forward tests (tiny config, synthetic data)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.models.retinanet import (
    RETINANET_TINY,
    RetinaNet,
    sigmoid_focal_loss,
)


@pytest.fixture(scope="module")
def model_and_vars():
    model = RetinaNet(config=RETINANET_TINY)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)
    return model, variables


class TestRetinaNet:
    def test_inference(self, model_and_vars):
        model, variables = model_and_vars
        images = jnp.asarray(
            np.random.default_rng(0).uniform(0, 255, size=(2, 64, 64, 3)), jnp.float32
        )
        dets = model.apply(variables, images, train=False)
        assert dets["boxes"].shape == (2, 4, 4)
        assert np.isfinite(np.asarray(dets["boxes"])).all()

    def test_train_losses(self, model_and_vars):
        model, variables = model_and_vars
        images = jnp.zeros((2, 64, 64, 3))
        gt_boxes = jnp.asarray([[[5.0, 5.0, 40.0, 40.0]]] * 2)
        gt_classes = jnp.zeros((2, 1), jnp.int32)
        gt_valid = jnp.ones((2, 1), bool)
        losses = model.apply(
            variables, images, gt_boxes=gt_boxes, gt_classes=gt_classes,
            gt_valid=gt_valid, train=True,
        )
        for k in ("loss_cls", "loss_box_reg", "loss_total"):
            assert np.isfinite(float(losses[k])), k

    def test_empty_gt(self, model_and_vars):
        model, variables = model_and_vars
        images = jnp.zeros((1, 64, 64, 3))
        losses = model.apply(
            variables, images,
            gt_boxes=jnp.zeros((1, 2, 4)), gt_classes=jnp.zeros((1, 2), jnp.int32),
            gt_valid=jnp.zeros((1, 2), bool), train=True,
        )
        assert np.isfinite(float(losses["loss_total"]))


class TestFocalLoss:
    def test_matches_oracle(self):
        rng = np.random.default_rng(1)
        logits = rng.normal(size=(10, 3)).astype(np.float32)
        targets = (rng.uniform(size=(10, 3)) > 0.5).astype(np.float32)
        a, g = 0.25, 2.0
        p = 1 / (1 + np.exp(-logits))
        ce = -(targets * np.log(p) + (1 - targets) * np.log(1 - p))
        pt = p * targets + (1 - p) * (1 - targets)
        expect = ce * (1 - pt) ** g * (a * targets + (1 - a) * (1 - targets))
        got = sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets), a, g)
        np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-4, atol=1e-6)
