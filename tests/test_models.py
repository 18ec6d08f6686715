"""Model family shape/e2e-forward tests (synthetic inputs, tiny configs).

Mirrors detectron2's tests/modeling/test_model_e2e.py approach: build with
random weights, run forward on synthetic data, assert output contracts.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spacecraft_pose_estimation_tpu.models import (
    MultiScaleDiscriminator,
    build_landmark_model,
)
from spacecraft_pose_estimation_tpu.models.hrnet import HRNET_TINY, HRNet
from spacecraft_pose_estimation_tpu.models.pose_resnet import (
    PoseResNet,
    PoseResNetConfig,
)
from spacecraft_pose_estimation_tpu.train.loss import (
    joints_mse_loss,
    joints_ohkm_mse_loss,
)


def tiny_hrnet(head, num_joints=5):
    return HRNet(config=dataclasses.replace(HRNET_TINY, num_joints=num_joints, head=head))


class TestHRNet:
    def test_classic_shapes(self):
        model = tiny_hrnet("classic")
        x = jnp.zeros((2, 64, 64, 3))
        variables = model.init(jax.random.key(0), x, train=False)
        out = model.apply(variables, x, train=False)
        assert out.shape == (2, 16, 16, 5)
        assert out.dtype == jnp.float32

    def test_classic_rect_input(self):
        model = tiny_hrnet("classic")
        x = jnp.zeros((1, 96, 64, 3))
        variables = model.init(jax.random.key(0), x, train=False)
        out = model.apply(variables, x, train=False)
        assert out.shape == (1, 24, 16, 5)

    def test_cms_eval_full_res(self):
        model = tiny_hrnet("cms")
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init(jax.random.key(0), x, train=False)
        out = model.apply(variables, x, train=False)
        assert out.shape == (1, 64, 64, 5)

    def test_cms_train_returns_four_scales(self):
        model = tiny_hrnet("cms")
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init(jax.random.key(0), x, train=True)
        outs, _ = model.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        assert [o.shape[1] for o in outs] == [64, 32, 16, 8]

    def test_cms_half_res(self):
        model = tiny_hrnet("cms_half")
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init(jax.random.key(0), x, train=False)
        out = model.apply(variables, x, train=False)
        assert out.shape == (1, 32, 32, 5)

    def test_train_updates_batch_stats(self):
        model = tiny_hrnet("classic")
        x = jnp.ones((2, 32, 32, 3))
        variables = model.init(jax.random.key(0), x, train=True)
        _, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(mutated["batch_stats"])
        assert any(
            not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after)
        )

    def test_bfloat16_compute(self):
        model = HRNet(config=dataclasses.replace(HRNET_TINY, num_joints=3), dtype=jnp.bfloat16)
        x = jnp.zeros((1, 32, 32, 3))
        variables = model.init(jax.random.key(0), x, train=False)
        out = model.apply(variables, x, train=False)
        assert out.dtype == jnp.float32  # heads cast back
        # params stay f32
        p0 = jax.tree_util.tree_leaves(variables["params"])[0]
        assert p0.dtype == jnp.float32


class TestPoseResNet:
    def test_shapes(self):
        model = PoseResNet(config=PoseResNetConfig(num_joints=4, depth=18, deconv_channels=16))
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init(jax.random.key(0), x, train=False)
        out = model.apply(variables, x, train=False)
        assert out.shape == (1, 16, 16, 4)


class TestDiscriminator:
    def test_domain_logits(self):
        model = MultiScaleDiscriminator(stage_blocks=(1, 1, 1, 1))
        j = 3
        hs = [jnp.zeros((2, r, r, j)) for r in (32, 16, 8, 4)]
        variables = model.init(jax.random.key(0), *hs, train=False)
        out = model.apply(variables, *hs, train=False)
        assert out.shape == (2, 2)


class TestRegistry:
    @pytest.mark.parametrize("name", ["pose_hrnet", "hrnet_cms", "hrnet_cms_384", "pose_resnet"])
    def test_build_by_name(self, name):
        model = build_landmark_model(name, num_joints=11)
        assert model is not None


class TestLoss:
    def _data(self):
        rng = np.random.default_rng(0)
        pred = rng.normal(size=(2, 8, 8, 6)).astype(np.float32)
        tgt = rng.normal(size=(2, 8, 8, 6)).astype(np.float32)
        w = (rng.uniform(size=(2, 6)) > 0.3).astype(np.float32)
        return pred, tgt, w

    def test_mse_matches_oracle(self):
        pred, tgt, w = self._data()
        # oracle: mean over joints of 0.5*mean((w*(p-t))^2) over batch+pixels
        diff = (pred - tgt) * w[:, None, None, :]
        expect = np.mean([0.5 * np.mean(diff[..., j] ** 2) for j in range(6)])
        got = joints_mse_loss(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(w))
        np.testing.assert_allclose(float(got), expect, rtol=1e-6)

    def test_mse_no_weight(self):
        pred, tgt, _ = self._data()
        expect = 0.5 * np.mean((pred - tgt) ** 2)
        got = joints_mse_loss(jnp.asarray(pred), jnp.asarray(tgt))
        np.testing.assert_allclose(float(got), expect, rtol=1e-6)

    def test_ohkm_topk(self):
        pred, tgt, w = self._data()
        diff = (pred - tgt) * w[:, None, None, :]
        per = 0.5 * np.mean(diff**2, axis=(1, 2))  # (B, J)
        k = 3
        expect = np.mean(np.sort(per, axis=-1)[:, -k:].sum(-1) / k)
        got = joints_ohkm_mse_loss(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(w), topk=k)
        np.testing.assert_allclose(float(got), expect, rtol=1e-6)
