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


def flax_to_torch_names(params, stats):
    """Inverse of the importer's name grammar — used to synthesise a
    torch-style state_dict from our initialised tree."""
    import re

    sd = {}

    def conv_t(k):
        return np.transpose(k, (3, 2, 0, 1))  # HWIO -> OIHW

    def emit_convbn(prefix_conv, prefix_bn, node, bn_stats):
        sd[prefix_conv + ".weight"] = conv_t(np.asarray(node["conv"]["kernel"]))
        sd[prefix_bn + ".weight"] = np.asarray(node["bn"]["scale"])
        sd[prefix_bn + ".bias"] = np.asarray(node["bn"]["bias"])
        sd[prefix_bn + ".running_mean"] = np.asarray(bn_stats["bn"]["mean"])
        sd[prefix_bn + ".running_var"] = np.asarray(bn_stats["bn"]["var"])

    def emit_block(tprefix, node, snode):
        for k in node:
            if k.startswith("conv"):
                i = k[-1]
                emit_convbn(f"{tprefix}.conv{i}", f"{tprefix}.bn{i}", node[k], snode[k])
            elif k == "down":
                sd[f"{tprefix}.downsample.0.weight"] = conv_t(np.asarray(node[k]["conv"]["kernel"]))
                sd[f"{tprefix}.downsample.1.weight"] = np.asarray(node[k]["bn"]["scale"])
                sd[f"{tprefix}.downsample.1.bias"] = np.asarray(node[k]["bn"]["bias"])
                sd[f"{tprefix}.downsample.1.running_mean"] = np.asarray(snode[k]["bn"]["mean"])
                sd[f"{tprefix}.downsample.1.running_var"] = np.asarray(snode[k]["bn"]["var"])

    for name, node in params.items():
        snode = stats.get(name, {})
        if name in ("stem1", "stem2"):
            i = name[-1]
            emit_convbn(f"conv{i}", f"bn{i}", node, snode)
        elif name == "layer1":
            for bk, bnode in node.items():
                emit_block(f"layer1.{bk.removeprefix('block')}", bnode, snode[bk])
        elif name.startswith("transition"):
            s = name.removeprefix("transition")
            for k, sub in node.items():
                if k.startswith("adapt"):
                    i = k.removeprefix("adapt")
                    emit_convbn(f"transition{s}.{i}.0", f"transition{s}.{i}.1", sub, snode[k])
                else:  # new{i}_{j}
                    i, j = k.removeprefix("new").split("_")
                    emit_convbn(
                        f"transition{s}.{i}.{j}.0", f"transition{s}.{i}.{j}.1", sub, snode[k]
                    )
        elif name.startswith("stage"):
            m = name.split("_m")
            s, mod = m[0].removeprefix("stage"), m[1]
            for k, sub in node.items():
                if k.startswith("branch"):
                    b = k.removeprefix("branch")
                    for bk, bnode in sub.items():
                        emit_block(
                            f"stage{s}.{mod}.branches.{b}.{bk.removeprefix('block')}",
                            bnode,
                            snode[k][bk],
                        )
                elif k == "fuse":
                    for fk, fnode in sub.items():
                        if fk.startswith("up"):
                            i, j = fk.removeprefix("up").split("_")
                            emit_convbn(
                                f"stage{s}.{mod}.fuse_layers.{i}.{j}.0",
                                f"stage{s}.{mod}.fuse_layers.{i}.{j}.1",
                                fnode,
                                snode[k][fk],
                            )
                        else:  # down{i}_{j}_{k}
                            i, j, kk = fk.removeprefix("down").split("_")
                            emit_convbn(
                                f"stage{s}.{mod}.fuse_layers.{i}.{j}.{kk}.0",
                                f"stage{s}.{mod}.fuse_layers.{i}.{j}.{kk}.1",
                                fnode,
                                snode[k][fk],
                            )
        elif name == "final_layer":
            sd["final_layer.weight"] = conv_t(np.asarray(node["kernel"]))
            sd["final_layer.bias"] = np.asarray(node["bias"])
    return sd


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
