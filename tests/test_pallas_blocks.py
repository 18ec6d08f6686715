"""Fused int8 block-chain kernel vs the XLA _Int8Ops walk — must match
bit-for-bit (both sides quantize with the same rounding points)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.ops.pallas_blocks import (
    chain_params_from_q,
    fused_basic_block_chain,
)


def xla_reference_chain(x, weights, mult, bias, coeffs, nblocks):
    """The per-op formulation (models/hrnet_int8.py convbn + add)."""

    def conv(xi, w):
        return jax.lax.conv_general_dilated(
            xi, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )

    def requant(f):
        return jnp.clip(jnp.round(f), -127, 127).astype(jnp.int8)

    for blk in range(nblocks):
        f1 = conv(x, weights[blk, 0]).astype(jnp.float32) * mult[blk, 0] + bias[blk, 0]
        x1 = requant(jnp.maximum(f1, 0.0))
        f2 = conv(x1, weights[blk, 1]).astype(jnp.float32) * mult[blk, 1] + bias[blk, 1]
        x2 = requant(f2)
        f = x2.astype(jnp.float32) * coeffs[blk, 0] + x.astype(jnp.float32) * coeffs[blk, 1]
        x = requant(jnp.maximum(f, 0.0))
    return x


def make_params(c, nblocks, seed=0):
    rng = np.random.default_rng(seed)
    weights = rng.integers(-40, 40, (nblocks, 2, 3, 3, c, c)).astype(np.int8)
    mult = rng.uniform(0.0005, 0.002, (nblocks, 2, c)).astype(np.float32)
    bias = rng.uniform(-0.3, 0.3, (nblocks, 2, c)).astype(np.float32)
    coeffs = rng.uniform(0.4, 1.2, (nblocks, 2)).astype(np.float32)
    return weights, mult, bias, coeffs


class TestFusedBlockChain:
    @pytest.mark.parametrize(
        "b,h,w,c,nblocks",
        [(2, 16, 16, 32, 4), (1, 8, 24, 64, 2), (3, 8, 8, 128, 1)],
        ids=["w32-branch0-like", "rect-64ch", "128ch"],
    )
    def test_matches_xla_walk(self, b, h, w, c, nblocks):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.integers(-80, 80, (b, h, w, c)), jnp.int8)
        weights, mult, bias, coeffs = map(jnp.asarray, make_params(c, nblocks))

        ref = xla_reference_chain(x, weights, mult, bias, coeffs, nblocks)
        out = fused_basic_block_chain(
            x, weights, mult, bias, coeffs, nblocks, interpret=True
        )
        assert out.dtype == jnp.int8
        mismatch = np.mean(np.asarray(out) != np.asarray(ref))
        # bit-exactness up to f32 rounding ties: allow a vanishing
        # fraction of off-by-one entries at exact .5 boundaries
        assert mismatch < 2e-3, mismatch
        np.testing.assert_allclose(
            np.asarray(out, np.int32), np.asarray(ref, np.int32), atol=1
        )

    def test_chain_params_from_q_layout(self):
        """Round-trip through the quantized-tree collector."""
        c, nblocks = 8, 2
        weights, mult, bias, coeffs = make_params(c, nblocks, seed=3)
        q = {"convs": {}, "adds": {}}
        for k in range(nblocks):
            bn = f"stage2_m0/branch0/block{k}"
            q["convs"][f"{bn}/conv1"] = {
                "w8": jnp.asarray(weights[k, 0]), "m": jnp.asarray(mult[k, 0]),
                "b": jnp.asarray(bias[k, 0]),
            }
            q["convs"][f"{bn}/conv2"] = {
                "w8": jnp.asarray(weights[k, 1]), "m": jnp.asarray(mult[k, 1]),
                "b": jnp.asarray(bias[k, 1]),
            }
            q["adds"][bn] = {"coeffs": [float(coeffs[k, 0]), float(coeffs[k, 1])]}
        packed = chain_params_from_q(q, "stage2_m0", 0, nblocks)
        assert packed is not None
        w, m, b, cf = packed
        np.testing.assert_array_equal(np.asarray(w), weights)
        np.testing.assert_allclose(np.asarray(cf), coeffs, rtol=1e-6)

        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.integers(-50, 50, (2, 8, 8, c)), jnp.int8)
        ref = xla_reference_chain(
            x, jnp.asarray(weights), jnp.asarray(mult), jnp.asarray(bias),
            jnp.asarray(coeffs), nblocks,
        )
        out = fused_basic_block_chain(x, w, m, b, cf, nblocks, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out, np.int32), np.asarray(ref, np.int32), atol=1
        )


class TestFusedBottleneckChain:
    def test_matches_xla_walk(self):
        """layer1-style chain: block0 projects 16->64 with a shortcut
        conv, blocks 1+ run 64->16->64 with identity residuals."""
        import jax.numpy as jnp

        from spacecraft_pose_estimation_tpu.ops.pallas_blocks import (
            fused_bottleneck_chain,
        )

        rng = np.random.default_rng(7)
        b, h, w = 2, 8, 8
        cin0, cm, cout, nblocks = 16, 16, 64, 3

        def rw(*shape, lo=-40, hi=40):
            return jnp.asarray(rng.integers(lo, hi, shape), jnp.int8)

        def rf(*shape, lo=5e-4, hi=2e-3):
            return jnp.asarray(rng.uniform(lo, hi, shape), jnp.float32)

        cin_max = cout
        w1 = np.zeros((nblocks, cin_max, cm), np.int8)
        w1[0, :cin0] = np.asarray(rw(cin0, cm))
        for k in range(1, nblocks):
            w1[k] = np.asarray(rw(cout, cm))
        w1 = jnp.asarray(w1)
        m1, b1 = rf(nblocks, cm), rf(nblocks, cm, lo=-0.2, hi=0.2)
        w2 = rw(nblocks, 3, 3, cm, cm)
        m2, b2 = rf(nblocks, cm), rf(nblocks, cm, lo=-0.2, hi=0.2)
        w3 = rw(nblocks, cm, cout)
        m3, b3 = rf(nblocks, cout), rf(nblocks, cout, lo=-0.2, hi=0.2)
        wd = rw(cin0, cout)
        md, bd = rf(cout), rf(cout, lo=-0.2, hi=0.2)
        coeffs = rf(nblocks, 2, lo=0.4, hi=1.2)

        x = jnp.asarray(rng.integers(-80, 80, (b, h, w, cin0)), jnp.int8)

        # XLA reference of the same per-op walk
        def requant(f):
            return jnp.clip(jnp.round(f), -127, 127).astype(jnp.int8)

        def dot(a, wk):
            return jax.lax.dot_general(
                a, wk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )

        def conv3(xi, wk):
            return jax.lax.conv_general_dilated(
                xi, wk, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )

        hw = h * w
        cur = None
        x0 = x.reshape(b, hw, cin0)
        for blk in range(nblocks):
            src = x0 if blk == 0 else cur
            kin = cin0 if blk == 0 else cout
            f1 = jnp.einsum("bpc,cd->bpd", src.astype(jnp.int32),
                            w1[blk, :kin].astype(jnp.int32)).astype(jnp.float32)
            x1 = requant(jnp.maximum(f1 * m1[blk] + b1[blk], 0.0))
            y2 = conv3(x1.reshape(b, h, w, cm), w2[blk])
            x2 = requant(jnp.maximum(
                y2.astype(jnp.float32) * m2[blk] + b2[blk], 0.0)).reshape(b, hw, cm)
            f3 = jnp.einsum("bpc,cd->bpd", x2.astype(jnp.int32),
                            w3[blk].astype(jnp.int32)).astype(jnp.float32)
            x3 = requant(f3 * m3[blk] + b3[blk])
            if blk == 0:
                fr = jnp.einsum("bpc,cd->bpd", x0.astype(jnp.int32),
                                wd.astype(jnp.int32)).astype(jnp.float32)
                r = requant(fr * md + bd)
            else:
                r = cur
            f = x3.astype(jnp.float32) * coeffs[blk, 0] + r.astype(jnp.float32) * coeffs[blk, 1]
            cur = requant(jnp.maximum(f, 0.0))
        ref = cur.reshape(b, h, w, cout)

        out = fused_bottleneck_chain(
            x, w1, m1, b1, w2, m2, b2, w3, m3, b3, wd, md, bd, coeffs,
            nblocks, chunk=32, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out, np.int32), np.asarray(ref, np.int32), atol=1
        )

        # the strip-mined variant (halo-loaded slabs) must match too,
        # including across strip boundaries
        from spacecraft_pose_estimation_tpu.ops.pallas_blocks import (
            fused_bottleneck_chain_strips,
        )

        out_s = fused_bottleneck_chain_strips(
            x, w1, m1, b1, w2, m2, b2, w3, m3, b3, wd, md, bd, coeffs,
            nblocks, strip=4, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out_s, np.int32), np.asarray(ref, np.int32), atol=1
        )

    def test_full_model_with_layer1_fusion(self):
        """End-to-end tiny model: fused layer1 + fused branches vs the
        per-op walk."""
        from tests.test_hrnet_int8 import tiny_setup  # noqa: F401
        # reuse via direct construction (fixture is module-scoped there)
        from spacecraft_pose_estimation_tpu.models.hrnet import HRNET_TINY, HRNet
        from spacecraft_pose_estimation_tpu.models.hrnet_int8 import (
            hrnet_int8_apply,
            quantize_hrnet,
        )

        model = HRNet(config=HRNET_TINY.with_joints(3))
        rng = np.random.default_rng(2)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=False)
        calib = jnp.asarray(rng.normal(0, 1.0, (2, 32, 32, 3)), jnp.float32)
        q = quantize_hrnet(model, variables, calib)
        x = jnp.asarray(rng.normal(0, 1.0, (1, 32, 32, 3)), jnp.float32)
        ref = hrnet_int8_apply(model.config, q, x, fused_blocks=False)
        out = hrnet_int8_apply(model.config, q, x, fused_blocks=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2, rtol=1e-3)
