"""SuperSloMo forward parity vs the REFERENCE torch implementation
(v2e/v2ecore/model.py), executed as a test oracle.

Covers the UNet topology (7x7/5x5/3x3 leaky-ReLU encoder-decoder), the
grid_sample-semantics backWarp (incl. its half-pixel sampling and zero
padding — v2ecore/model.py:268-300), and the full per-t interpolation
math of slomo.py:343-433 (flow coefficients, visibility blending, and
the t=(i+0.5)/U midpoint schedule).
"""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # e2e/oracle tier (> ~30 s)

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

V2E_ROOT = "/root/reference/v2e"


@pytest.fixture(scope="module")
def ref_model():
    sys.path.insert(0, V2E_ROOT)
    try:
        from v2ecore import model as ref_model_mod
    finally:
        sys.path.remove(V2E_ROOT)
    return ref_model_mod


def import_unets(flow_sd, interp_sd):
    from spacecraft_pose_estimation_tpu.events.slomo import (
        SuperSloMo,
        slomo_torch_to_flax,
    )

    model = SuperSloMo()
    f = jnp.zeros((1, 32, 32, 1))
    variables = model.init(jax.random.key(0), f, f, jnp.asarray([0.5]))
    params = slomo_torch_to_flax(
        {"state_dictFC": flow_sd, "state_dictAT": interp_sd}
    )
    return model, {"params": params}, variables


class TestSloMoParity:
    def test_unet_forward_parity(self, ref_model):
        from spacecraft_pose_estimation_tpu.events.slomo import (
            UNet,
            _unet_sd_to_flax,
        )

        torch.manual_seed(0)
        ref = ref_model.UNet(6, 4)
        ref.eval()
        ours = UNet(4)
        params = _unet_sd_to_flax(ref.state_dict())

        x = np.random.default_rng(0).normal(size=(2, 6, 32, 32)).astype(np.float32)
        with torch.no_grad():
            ref_out = ref(torch.tensor(x)).numpy()
        out = ours.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
        out = np.asarray(out).transpose(0, 3, 1, 2)
        assert out.shape == ref_out.shape
        np.testing.assert_allclose(out, ref_out, atol=2e-4, rtol=1e-3)

    def test_backwarp_torch_mode_parity(self, ref_model):
        from spacecraft_pose_estimation_tpu.events.slomo import backwarp

        rng = np.random.default_rng(1)
        h = w = 16
        img = rng.normal(size=(2, 1, h, w)).astype(np.float32)
        flow = (rng.normal(size=(2, 2, h, w)) * 3).astype(np.float32)

        warper = ref_model.backWarp(w, h, "cpu")
        with torch.no_grad():
            ref_out = warper(torch.tensor(img), torch.tensor(flow)).numpy()

        ours = backwarp(
            jnp.asarray(img.transpose(0, 2, 3, 1)),
            jnp.asarray(flow.transpose(0, 2, 3, 1)),
            mode="torch",
        )
        ours = np.asarray(ours).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(ours, ref_out, atol=1e-5, rtol=1e-5)

    def test_full_interpolation_parity(self, ref_model):
        """Replicates the reference's interpolation loop
        (slomo.py:343-433) with its own torch modules and random weights,
        then requires our fused SuperSloMo to match per midpoint t."""
        torch.manual_seed(2)
        # v2e's grayscale SuperSloMo wiring (slomo.py:208-212)
        flow_net = ref_model.UNet(2, 4)
        interp_net = ref_model.UNet(12, 5)
        flow_net.eval()
        interp_net.eval()
        h = w = 32
        warper = ref_model.backWarp(w, h, "cpu")

        rng = np.random.default_rng(3)
        f0 = rng.uniform(0, 1, (1, 1, h, w)).astype(np.float32)
        f1 = np.clip(
            f0 + rng.normal(0, 0.08, f0.shape).astype(np.float32), 0, 1
        )

        U = 4
        ref_frames = []
        with torch.no_grad():
            I0, I1 = torch.tensor(f0), torch.tensor(f1)
            flowOut = flow_net(torch.cat((I0, I1), dim=1))
            F01, F10 = flowOut[:, :2], flowOut[:, 2:]
            for i in range(U):
                t = (i + 0.5) / U
                temp = -t * (1 - t)
                Ft0 = temp * F01 + t * t * F10
                Ft1 = (1 - t) * (1 - t) * F01 + temp * F10
                g0 = warper(I0, Ft0)
                g1 = warper(I1, Ft1)
                intrp = interp_net(
                    torch.cat((I0, I1, F01, F10, Ft1, Ft0, g1, g0), dim=1)
                )
                Ft0f = intrp[:, :2] + Ft0
                Ft1f = intrp[:, 2:4] + Ft1
                V0 = torch.sigmoid(intrp[:, 4:5])
                V1 = 1 - V0
                g0f = warper(I0, Ft0f)
                g1f = warper(I1, Ft1f)
                out = ((1 - t) * V0 * g0f + t * V1 * g1f) / (
                    (1 - t) * V0 + t * V1
                )
                ref_frames.append(out.numpy())

        model, imported, _ = import_unets(
            flow_net.state_dict(), interp_net.state_dict()
        )
        from spacecraft_pose_estimation_tpu.events.slomo import interpolate_pair

        ours = interpolate_pair(
            model,
            imported,
            jnp.asarray(f0.transpose(0, 2, 3, 1)),
            jnp.asarray(f1.transpose(0, 2, 3, 1)),
            U,
        )
        ours = np.asarray(ours)  # (U, B, H, W, C)
        assert ours.shape[0] == U
        for i in range(U):
            np.testing.assert_allclose(
                ours[i].transpose(0, 3, 1, 2),
                ref_frames[i],
                atol=5e-4,
                rtol=1e-3,
            )
