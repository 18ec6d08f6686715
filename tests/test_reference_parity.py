"""Numerical parity against the REFERENCE implementation itself.

The reference's pose_hrnet is pure torch, so we can import it from
/root/reference (read-only, execution as a test oracle), transfer its
randomly-initialised weights through our torch->Flax importer, and
require the two frameworks' forward passes to agree to float tolerance.
This validates the full trunk topology (stem, transitions, stage
modules, fuse layers, final head) end to end, not just per-layer shapes.
"""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # e2e/oracle tier (> ~30 s)

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF_LIB = "/root/reference/landmark_regression/lib"


@pytest.fixture(scope="module")
def reference_hrnet():
    if not os.path.isdir(REF_LIB):
        pytest.skip("reference checkout not available")
    sys.path.insert(0, REF_LIB)
    try:
        from models import pose_hrnet as ref_pose_hrnet
    finally:
        sys.path.remove(REF_LIB)
    return ref_pose_hrnet


def tiny_ref_cfg(num_joints=5):
    """A reduced HRNet spec accepted by the reference's builder."""
    return {
        "MODEL": {
            "NUM_JOINTS": num_joints,
            "INIT_WEIGHTS": False,
            "PRETRAINED": "",
            "EXTRA": {
                "FINAL_CONV_KERNEL": 1,
                "PRETRAINED_LAYERS": ["*"],
                "STAGE2": {
                    "NUM_MODULES": 1, "NUM_BRANCHES": 2, "BLOCK": "BASIC",
                    "NUM_BLOCKS": [1, 1], "NUM_CHANNELS": [4, 8],
                    "FUSE_METHOD": "SUM",
                },
                "STAGE3": {
                    "NUM_MODULES": 1, "NUM_BRANCHES": 3, "BLOCK": "BASIC",
                    "NUM_BLOCKS": [1, 1, 1], "NUM_CHANNELS": [4, 8, 16],
                    "FUSE_METHOD": "SUM",
                },
                "STAGE4": {
                    "NUM_MODULES": 1, "NUM_BRANCHES": 4, "BLOCK": "BASIC",
                    "NUM_BLOCKS": [1, 1, 1, 1], "NUM_CHANNELS": [4, 8, 16, 32],
                    "FUSE_METHOD": "SUM",
                },
            },
        }
    }


class TestHRNetForwardParity:
    def test_forward_matches_reference(self, reference_hrnet):
        import dataclasses

        from spacecraft_pose_estimation_tpu.models.hrnet import HRNet, HRNetConfig, StageSpec
        from spacecraft_pose_estimation_tpu.utils.torch_import import (
            hrnet_torch_to_flax,
            merge_pretrained,
        )

        num_joints = 5
        torch.manual_seed(0)
        ref = reference_hrnet.get_pose_net(tiny_ref_cfg(num_joints), is_train=False)
        ref.eval()
        # randomise BN stats so eval mode is non-trivial
        with torch.no_grad():
            for m in ref.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                    m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)

        # NOTE: the reference stem is 64-wide with a 4-block Bottleneck
        # layer1; our HRNetConfig mirrors that via stem_channels/stage1.
        ours_cfg = HRNetConfig(
            num_joints=num_joints,
            stem_channels=64,
            stage1_blocks=4,
            stage2=StageSpec(1, 2, (1, 1), (4, 8)),
            stage3=StageSpec(1, 3, (1, 1, 1), (4, 8, 16)),
            stage4=StageSpec(1, 4, (1, 1, 1, 1), (4, 8, 16, 32)),
            head="classic",
        )
        model = HRNet(config=ours_cfg)
        x0 = jnp.zeros((1, 64, 64, 3))
        variables = model.init(jax.random.key(0), x0, train=False)

        params, stats = hrnet_torch_to_flax(ref.state_dict(), pretrained_layers=("*",))
        merged = merge_pretrained(variables, params, stats)

        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            ref_out = ref(torch.tensor(x)).numpy()  # (2, J, 16, 16)
        ours = model.apply(merged, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
        ours_nchw = np.asarray(ours).transpose(0, 3, 1, 2)
        assert ours_nchw.shape == ref_out.shape
        np.testing.assert_allclose(ours_nchw, ref_out, atol=2e-4, rtol=1e-3)

    def test_importer_covers_all_reference_weights(self, reference_hrnet):
        from spacecraft_pose_estimation_tpu.utils.torch_import import hrnet_torch_to_flax

        ref = reference_hrnet.get_pose_net(tiny_ref_cfg(3), is_train=False)
        sd = ref.state_dict()
        params, stats = hrnet_torch_to_flax(sd, pretrained_layers=("*",))

        def count_leaves(tree):
            return len(jax.tree_util.tree_leaves(tree))

        n_mapped = count_leaves(params) + count_leaves(stats)
        n_torch = sum(1 for k in sd if "num_batches_tracked" not in k)
        assert n_mapped == n_torch, (n_mapped, n_torch)


class AttrDict(dict):
    """Minimal yacs-like node: attribute + item access, recursively."""

    def __getattr__(self, k):
        v = self[k]
        return AttrDict(v) if isinstance(v, dict) else v


@pytest.fixture(scope="module")
def reference_cms_modules():
    if not os.path.isdir(REF_LIB):
        pytest.skip("reference checkout not available")
    sys.path.insert(0, REF_LIB)
    try:
        from models import hrnet_cms as ref_cms
        from models import hrnet_cms_384 as ref_cms_384
    finally:
        sys.path.remove(REF_LIB)
    return ref_cms, ref_cms_384


class TestCMSForwardParity:
    """hrnet_cms / hrnet_cms_384 vs the reference torch modules
    (hrnet_cms.py:324-420,551-562; hrnet_cms_384.py:353-412) — trunk with
    all four stage-4 branches kept, per-branch deconv heads, top-down
    bilinear fusion, and the train-mode 4-tuple contract."""

    def _run(self, ref_module, head, deconv_stride):
        import dataclasses

        from spacecraft_pose_estimation_tpu.models.hrnet import (
            HRNet,
            HRNetConfig,
            StageSpec,
        )
        from spacecraft_pose_estimation_tpu.utils.torch_import import (
            hrnet_torch_to_flax,
            merge_pretrained,
        )

        num_joints = 4
        torch.manual_seed(1)
        ref = ref_module.get_pose_net(AttrDict(tiny_ref_cfg(num_joints)), is_train=False)
        ref.eval()
        with torch.no_grad():
            for m in ref.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                    m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)

        ours_cfg = HRNetConfig(
            num_joints=num_joints,
            stem_channels=64,
            stage1_blocks=4,
            stage2=StageSpec(1, 2, (1, 1), (4, 8)),
            stage3=StageSpec(1, 3, (1, 1, 1), (4, 8, 16)),
            stage4=StageSpec(1, 4, (1, 1, 1, 1), (4, 8, 16, 32)),
            head=head,
        )
        model = HRNet(config=ours_cfg)
        size = 64
        variables = model.init(jax.random.key(0), jnp.zeros((1, size, size, 3)), train=False)
        params, stats = hrnet_torch_to_flax(ref.state_dict(), pretrained_layers=("*",))
        merged = merge_pretrained(variables, params, stats)

        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 3, size, size)).astype(np.float32)
        with torch.no_grad():
            ref_eval = ref(torch.tensor(x)).numpy()
        ours_eval = model.apply(merged, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
        ours_eval = np.asarray(ours_eval).transpose(0, 3, 1, 2)
        assert ours_eval.shape == ref_eval.shape
        expect_hw = size // (deconv_stride // 4 if deconv_stride == 4 else 2)
        assert ref_eval.shape[-1] == (size if deconv_stride == 4 else size // 2)
        np.testing.assert_allclose(ours_eval, ref_eval, atol=3e-4, rtol=1e-3)

        # train-mode 4-tuple (torch .train() only changes BN; compare the
        # multi-scale outputs using eval BN stats on both sides)
        ref.train()
        with torch.no_grad():
            for m in ref.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.eval()
            ref_tuple = [t.numpy() for t in ref(torch.tensor(x))]
        ours_tuple = model.apply(
            merged, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False,
            return_all_scales=True,
        )
        assert len(ours_tuple) == 4
        for a, b in zip(ours_tuple, ref_tuple):
            np.testing.assert_allclose(
                np.asarray(a).transpose(0, 3, 1, 2), b, atol=3e-4, rtol=1e-3
            )

    def test_hrnet_cms(self, reference_cms_modules):
        self._run(reference_cms_modules[0], "cms", 4)

    def test_hrnet_cms_384(self, reference_cms_modules):
        self._run(reference_cms_modules[1], "cms_half", 2)


class TestGradientParity:
    """One training step's GRADIENTS must match the reference stack:
    same weights, same batch, JointsMSELoss on both sides (lib/core/
    loss.py:15-39), torch autograd vs jax.grad. This validates training
    dynamics, not just the forward pass."""

    def test_hrnet_gradients_match_torch(self, reference_hrnet):
        from spacecraft_pose_estimation_tpu.models.hrnet import (
            HRNet,
            HRNetConfig,
            StageSpec,
        )
        from spacecraft_pose_estimation_tpu.train.loss import joints_mse_loss
        from spacecraft_pose_estimation_tpu.utils.torch_import import (
            hrnet_torch_to_flax,
            merge_pretrained,
        )

        num_joints = 4
        torch.manual_seed(3)
        ref = reference_hrnet.get_pose_net(tiny_ref_cfg(num_joints), is_train=False)
        ref.train()  # torch BN in batch-stats mode, like our train=True

        ours_cfg = HRNetConfig(
            num_joints=num_joints,
            stem_channels=64,
            stage1_blocks=4,
            stage2=StageSpec(1, 2, (1, 1), (4, 8)),
            stage3=StageSpec(1, 3, (1, 1, 1), (4, 8, 16)),
            stage4=StageSpec(1, 4, (1, 1, 1, 1), (4, 8, 16, 32)),
            head="classic",
        )
        model = HRNet(config=ours_cfg)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)
        params, stats = hrnet_torch_to_flax(ref.state_dict(), pretrained_layers=("*",))
        merged = merge_pretrained(variables, params, stats)

        rng = np.random.default_rng(5)
        x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
        target = rng.uniform(0, 1, (2, num_joints, 16, 16)).astype(np.float32)
        tw = np.ones((2, num_joints), np.float32)

        # ---- torch side
        xt = torch.tensor(x, requires_grad=False)
        out_t = ref(xt)
        # JointsMSELoss semantics: 0.5 * MSE per joint, mean over joints
        loss_t = 0.0
        for j in range(num_joints):
            loss_t = loss_t + 0.5 * torch.nn.functional.mse_loss(
                out_t[:, j], torch.tensor(target[:, j])
            )
        loss_t = loss_t / num_joints
        loss_t.backward()
        torch_grads = {
            k: p.grad.detach().numpy() for k, p in ref.named_parameters()
            if p.grad is not None
        }

        # ---- jax side
        def loss_fn(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": merged["batch_stats"]},
                jnp.asarray(x.transpose(0, 2, 3, 1)),
                train=True,
                mutable=["batch_stats"],
            )
            return joints_mse_loss(
                out, jnp.asarray(target.transpose(0, 2, 3, 1)), jnp.asarray(tw)
            )

        jax_loss = float(loss_fn(merged["params"]))
        np.testing.assert_allclose(jax_loss, float(loss_t.detach()), rtol=1e-4)

        grads = jax.grad(loss_fn)(merged["params"])

        # spot-check representative leaves across the depth of the net:
        # stem conv, a stage-2 branch conv, a fuse conv, the final head
        checks = [
            ("conv1.weight", grads["stem1"]["conv"]["kernel"], (3, 2, 0, 1)),
            ("final_layer.weight", grads["final_layer"]["kernel"], (3, 2, 0, 1)),
            ("final_layer.bias", grads["final_layer"]["bias"], None),
            (
                "stage2.0.branches.0.0.conv1.weight",
                grads["stage2_m0"]["branch0"]["block0"]["conv1"]["conv"]["kernel"],
                (3, 2, 0, 1),
            ),
            (
                "stage3.0.fuse_layers.0.1.0.weight",
                grads["stage3_m0"]["fuse"]["up0_1"]["conv"]["kernel"],
                (3, 2, 0, 1),
            ),
        ]
        for tkey, jleaf, perm in checks:
            tg = torch_grads[tkey]
            jg = np.asarray(jleaf)
            if perm is not None:
                jg = jg.transpose(*perm)
            assert jg.shape == tg.shape, (tkey, jg.shape, tg.shape)
            scale = np.abs(tg).max() + 1e-12
            np.testing.assert_allclose(jg / scale, tg / scale, atol=2e-4, err_msg=tkey)
