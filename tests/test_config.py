"""Config system + registry + deform conv + memory util tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spacecraft_pose_estimation_tpu import config as C
from spacecraft_pose_estimation_tpu.ops.deform_conv import DeformConv, deform_conv2d
from spacecraft_pose_estimation_tpu.utils.registry import Registry


class TestOverrides:
    def test_key_value_pairs(self):
        cfg = C.get_preset("events")
        out = C.apply_overrides(cfg, ["TRAIN.LR", "0.01", "MODEL.NUM_JOINTS", "24"])
        assert out.train.lr == 0.01
        assert out.model.num_joints == 24
        assert cfg.train.lr == 0.001  # frozen original untouched

    def test_tuple_and_bool_coercion(self):
        cfg = C.get_preset("events")
        out = C.apply_overrides(
            cfg, ["MODEL.IMAGE_SIZE", "[256, 192]", "TEST.FLIP_TEST", "true"]
        )
        assert out.model.image_size == (256, 192)
        assert out.test.flip_test is True

    def test_unknown_key_raises(self):
        with pytest.raises(KeyError):
            C.apply_overrides(C.get_preset("events"), ["NOPE.X", "1"])

    def test_yaml_merge(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text("TRAIN:\n  LR: 0.005\nMODEL:\n  SIGMA: 3\n")
        out = C.load_yaml(C.get_preset("events"), str(p))
        assert out.train.lr == 0.005
        assert out.model.sigma == 3

    def test_auto_scale_workers(self):
        cfg = C.apply_overrides(C.get_preset("events"), ["TRAIN.REFERENCE_WORLD_SIZE", "8"])
        out = C.auto_scale_workers(cfg, 16)
        assert out.train.lr == pytest.approx(cfg.train.lr * 2)

    def test_presets_exist(self):
        for name in ("events", "lightbox_cms", "sunlamp_cms"):
            assert name in C.list_presets()


class TestInstantiate:
    def test_nested(self):
        node = {
            "_target_": "collections.OrderedDict",
            "items": [("a", {"_target_": "builtins.int", "x": "5"})],
        }
        # int(x="5") invalid; use simpler target
        node = C.LazyCall(dict)(a=1, b={"_target_": "builtins.frozenset"})
        out = C.instantiate(node)
        assert out == {"a": 1, "b": frozenset()}

    def test_string_target(self):
        out = C.instantiate(
            {"_target_": "fractions.Fraction", "numerator": 1, "denominator": 2}
        )
        assert float(out) == 0.5


class TestRegistry:
    def test_register_and_get(self):
        reg = Registry("models")

        @reg.register
        def thing():
            return 42

        assert reg.get("thing")() == 42
        assert "thing" in reg
        with pytest.raises(KeyError):
            reg.get("missing")
        with pytest.raises(KeyError):
            reg.register(thing)


class TestDeformConv:
    def test_zero_offsets_match_regular_conv(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(8, 8, 4)).astype(np.float32))
        kernel = jnp.asarray(rng.normal(size=(3, 3, 4, 6)).astype(np.float32))
        offsets = jnp.zeros((8, 8, 18))
        out = deform_conv2d(x, offsets, kernel)
        ref = jax.lax.conv_general_dilated(
            x[None], kernel, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_integer_offset_shifts_sampling(self):
        x = jnp.zeros((6, 6, 1)).at[3, 4, 0].set(1.0)
        kernel = jnp.zeros((3, 3, 1, 1)).at[1, 1, 0, 0].set(1.0)  # identity tap
        # center tap of 3x3 is t=4; its dx lives at channel 2*4+1
        offsets = jnp.zeros((6, 6, 18)).at[3, 3, 9].set(1.0)
        out = deform_conv2d(x, offsets, kernel)
        assert float(out[3, 3, 0]) == pytest.approx(1.0)

    def test_module_forward(self):
        m = DeformConv(5)
        x = jnp.zeros((2, 8, 8, 3))
        v = m.init(jax.random.key(0), x)
        out = m.apply(v, x)
        assert out.shape == (2, 8, 8, 5)


class TestRetryOom:
    def test_splits_batch_on_oom(self):
        from spacecraft_pose_estimation_tpu.utils.memory import retry_if_oom

        calls = []

        def fn(x):
            calls.append(x.shape[0])
            if x.shape[0] > 2:
                raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")
            return x * 2

        out = retry_if_oom(fn)(jnp.ones((8, 3)))
        assert out.shape == (8, 3)
        assert calls[0] == 8 and max(calls[1:]) <= 4
