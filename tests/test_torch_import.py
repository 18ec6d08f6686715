"""Torch->Flax weight import: mapping completeness + numeric equivalence."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from spacecraft_pose_estimation_tpu.models.hrnet import HRNET_TINY, HRNet
from spacecraft_pose_estimation_tpu.utils.torch_import import (
    hrnet_torch_to_flax,
    merge_pretrained,
)


from spacecraft_pose_estimation_tpu.utils.torch_export import (
    hrnet_flax_to_torch as flax_to_torch_names,  # promoted from this file (round 4)
)


class TestHRNetImport:
    def test_roundtrip_identity(self):
        """flax init -> synthetic torch sd -> import == original tree."""
        model = HRNet(config=dataclasses.replace(HRNET_TINY, num_joints=3))
        variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=False)
        # randomise so equality is meaningful
        variables = jax.tree_util.tree_map(
            lambda x: x + np.random.default_rng(0).normal(0, 0.01, x.shape).astype(x.dtype),
            variables,
        )
        params = jax.tree_util.tree_map(np.asarray, dict(variables["params"]))
        stats = jax.tree_util.tree_map(np.asarray, dict(variables["batch_stats"]))
        sd = flax_to_torch_names(params, stats)
        assert len(sd) > 50

        imported_params, imported_stats = hrnet_torch_to_flax(
            sd, pretrained_layers=("*",)
        )
        fresh = model.init(jax.random.key(1), jnp.zeros((1, 32, 32, 3)), train=False)
        merged = merge_pretrained(fresh, imported_params, imported_stats)

        # every trunk+head leaf must now equal the original values
        orig_flat = jax.tree_util.tree_leaves_with_path(variables["params"])
        merged_p = merged["params"]
        for path, leaf in orig_flat:
            node = merged_p
            for p in path:
                node = node[p.key]
            np.testing.assert_allclose(np.asarray(node), np.asarray(leaf), atol=1e-6)

    def test_pretrained_layers_filter(self):
        model = HRNet(config=dataclasses.replace(HRNET_TINY, num_joints=3))
        variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=False)
        params = jax.tree_util.tree_map(np.asarray, dict(variables["params"]))
        stats = jax.tree_util.tree_map(np.asarray, dict(variables["batch_stats"]))
        sd = flax_to_torch_names(params, stats)
        imported, _ = hrnet_torch_to_flax(sd)  # default filter: no final_layer
        assert "final_layer" not in imported
        assert "stem1" in imported and "stage4_m0" in imported

    def test_forward_matches_torch_convbn(self):
        """One ConvBN unit vs torch Conv2d+BatchNorm2d eval-mode."""
        import torch.nn as tnn

        from spacecraft_pose_estimation_tpu.models.layers import ConvBN

        rng = np.random.default_rng(1)
        x = rng.normal(size=(1, 3, 10, 12)).astype(np.float32)  # NCHW

        conv = tnn.Conv2d(3, 5, 3, stride=2, padding=1, bias=False)
        bn = tnn.BatchNorm2d(5)
        bn.eval()
        with torch.no_grad():
            bn.running_mean.copy_(torch.tensor(rng.normal(size=5).astype(np.float32)))
            bn.running_var.copy_(torch.tensor(rng.uniform(0.5, 2, 5).astype(np.float32)))
            bn.weight.copy_(torch.tensor(rng.normal(size=5).astype(np.float32)))
            bn.bias.copy_(torch.tensor(rng.normal(size=5).astype(np.float32)))
            ref = torch.relu(bn(conv(torch.tensor(x)))).numpy()

        m = ConvBN(5, 3, 2)
        variables = m.init(jax.random.key(0), jnp.zeros((1, 10, 12, 3)), train=False)
        variables = {
            "params": {
                "conv": {"kernel": jnp.asarray(conv.weight.detach().numpy().transpose(2, 3, 1, 0))},
                "bn": {
                    "scale": jnp.asarray(bn.weight.detach().numpy()),
                    "bias": jnp.asarray(bn.bias.detach().numpy()),
                },
            },
            "batch_stats": {
                "bn": {
                    "mean": jnp.asarray(bn.running_mean.numpy()),
                    "var": jnp.asarray(bn.running_var.numpy()),
                }
            },
        }
        out = m.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-5
        )
