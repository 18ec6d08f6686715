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
