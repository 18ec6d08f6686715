"""RegNet backbone tests."""

import numpy as np
import jax
import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.models.regnet import (
    REGNET_TINY,
    REGNETY_400MF,
    RegNet,
    RegNetConfig,
)


class TestRegNet:
    def test_feature_pyramid_shapes(self):
        model = RegNet(config=REGNET_TINY)
        x = jnp.zeros((1, 64, 64, 3))
        v = model.init(jax.random.key(0), x)
        feats = model.apply(v, x)
        assert feats["s1"].shape == (1, 16, 16, 8)
        assert feats["s2"].shape == (1, 8, 8, 16)
        assert feats["s3"].shape == (1, 4, 4, 32)
        assert feats["s4"].shape == (1, 2, 2, 64)

    def test_regnety_se_block(self):
        cfg = RegNetConfig(depths=(1, 1, 1, 1), widths=(8, 16, 32, 64),
                           group_width=8, stem_width=8, se_ratio=0.25)
        model = RegNet(config=cfg)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 32, 32, 3)), jnp.float32)
        v = model.init(jax.random.key(0), x)
        feats = model.apply(v, x)
        assert np.isfinite(np.asarray(feats["s4"])).all()
        # SE params exist
        flat = jax.tree_util.tree_leaves_with_path(v["params"])
        assert any("se" in "/".join(str(p.key) for p in path) for path, _ in flat)

    def test_group_conv_divides(self):
        model = RegNet(config=REGNET_TINY)
        v = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        # grouped 3x3 kernel has reduced input-channel dim
        k = v["params"]["s2_b0"]["b"]["conv"]["kernel"]
        assert k.shape == (3, 3, 8, 16)  # in/groups = 16/2? group_width 8 -> groups 2
