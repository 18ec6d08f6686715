"""SuperSloMo torch checkpoint import: mapping completeness."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from spacecraft_pose_estimation_tpu.events.slomo import (
    SuperSloMo,
    UNet,
    slomo_torch_to_flax,
)


def synthetic_unet_sd(params):
    """Flax UNet params -> torch-style state_dict (inverse mapping)."""
    sd = {}

    def conv_t(k):
        return torch.tensor(np.transpose(np.asarray(k), (3, 2, 0, 1)))

    def emit(prefix, node):
        sd[prefix + ".weight"] = conv_t(node["kernel"])
        sd[prefix + ".bias"] = torch.tensor(np.asarray(node["bias"]))

    for name, node in params.items():
        if name.startswith("conv"):
            emit(name, node)
        else:  # down/up blocks
            for sub, subnode in node.items():
                emit(f"{name}.{sub}", subnode)
    return sd


class TestSloMoImport:
    def test_roundtrip_identity(self):
        model = SuperSloMo()
        f = jnp.zeros((1, 32, 32, 1))
        variables = model.init(jax.random.key(0), f, f, jnp.asarray([0.5]))
        params = jax.tree_util.tree_map(np.asarray, dict(variables["params"]))
        ckpt = {
            "state_dictFC": synthetic_unet_sd(params["flow_comp"]),
            "state_dictAT": synthetic_unet_sd(params["arb_interp"]),
        }
        imported = slomo_torch_to_flax(ckpt)
        for path, leaf in jax.tree_util.tree_leaves_with_path(variables["params"]):
            node = imported
            for p in path:
                node = node[p.key]
            np.testing.assert_allclose(np.asarray(node), np.asarray(leaf), atol=1e-6,
                                       err_msg=str(path))

    def test_unet_layer_names(self):
        m = UNet(4)
        v = m.init(jax.random.key(0), jnp.zeros((1, 32, 32, 6)))
        names = set(v["params"].keys())
        assert {"conv1", "conv2", "conv3", "down1", "down5", "up1", "up5"} <= names
