"""Mask/Keypoint R-CNN wiring tests (tiny config)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.models.rcnn import RCNN_TINY, GeneralizedRCNN


@pytest.fixture(scope="module")
def mk_model():
    cfg = dataclasses.replace(
        RCNN_TINY, with_mask=True, with_keypoints=True, num_keypoints=4,
        mask_resolution=7,
    )
    model = GeneralizedRCNN(config=cfg)
    variables = model.init(
        {"params": jax.random.key(0), "sampling": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3)),
        train=False,
    )
    return model, variables


def gt_batch():
    rng = np.random.default_rng(0)
    gt_boxes = jnp.asarray([[[8.0, 8.0, 40.0, 40.0], [30.0, 30.0, 60.0, 60.0]]])
    gt_classes = jnp.zeros((1, 2), jnp.int32)
    gt_valid = jnp.ones((1, 2), bool)
    masks = np.zeros((1, 2, 64, 64), bool)
    masks[0, 0, 8:40, 8:40] = True
    masks[0, 1, 30:60, 30:60] = True
    kps = rng.uniform(10, 38, size=(1, 2, 4, 3)).astype(np.float32)
    kps[..., 2] = 2.0
    return gt_boxes, gt_classes, gt_valid, jnp.asarray(masks), jnp.asarray(kps)


class TestMaskKeypointRCNN:
    def test_inference_emits_mask_and_kp_logits(self, mk_model):
        model, variables = mk_model
        dets = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
        assert dets["mask_logits"].shape[:2] == (1, 2)
        assert dets["mask_logits"].shape[2:4] == (14, 14)
        assert dets["keypoint_logits"].shape[-1] == 4
        assert np.isfinite(np.asarray(dets["mask_logits"])).all()

    @pytest.mark.slow
    def test_training_losses_include_mask_and_keypoint(self, mk_model):
        model, variables = mk_model
        gt_boxes, gt_classes, gt_valid, gt_masks, gt_kps = gt_batch()
        losses = model.apply(
            variables,
            jnp.zeros((1, 64, 64, 3)),
            gt_boxes=gt_boxes, gt_classes=gt_classes, gt_valid=gt_valid,
            gt_masks=gt_masks, gt_keypoints=gt_kps,
            train=True, rngs={"sampling": jax.random.key(2)},
        )
        assert "loss_mask" in losses and "loss_keypoint" in losses
        for k, v in losses.items():
            assert np.isfinite(float(v)), k
