"""Exactness tests for the space-to-depth conv formulations (ops/s2d.py).

Every packed conv must be BIT-EXACT against the direct int8 conv: the
weight transforms are pure zero-scatters, so the int32 accumulations sum
the identical multiset of products.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spacecraft_pose_estimation_tpu.ops import s2d

pytestmark = pytest.mark.smoke


def direct_conv3(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def rnd_int8(rng, shape):
    return jnp.asarray(rng.integers(-127, 128, shape), jnp.int8)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_pack_unpack_roundtrip(rng):
    x = rnd_int8(rng, (2, 16, 12, 5))
    assert (s2d.unpack_even(s2d.pack_even(x)) == x).all()


def test_pack_layout_position_major(rng):
    x = rnd_int8(rng, (1, 4, 4, 3))
    p = s2d.pack_even(x)
    c = 3
    for dy in range(2):
        for dx in range(2):
            pos = 2 * dy + dx
            np.testing.assert_array_equal(
                np.asarray(p[0, 1, 1, pos * c:(pos + 1) * c]),
                np.asarray(x[0, 2 + dy, 2 + dx]),
            )


def test_even_to_odd_exact(rng):
    """conv B: packed even->odd == direct 3x3 on the odd grid."""
    B, H, W, C, CO = 2, 16, 12, 5, 7
    x = rnd_int8(rng, (B, H, W, C))
    w3 = rnd_int8(rng, (3, 3, C, CO))
    y_direct = direct_conv3(x.astype(jnp.int32).astype(jnp.int8), w3)  # (B,H,W,CO)

    xp = s2d.pack_even(x)
    wp = jnp.asarray(s2d.w3_pack_alt(np.asarray(w3)))
    yo = s2d.conv_even_to_odd(xp, wp)
    mask = s2d.odd_zero_mask(H // 2 + 1, W // 2 + 1, CO, dtype=jnp.int32)
    yo = yo * mask

    # odd cell (I,J) pos (dy,dx) = direct output pixel (2I-1+dy, 2J-1+dx)
    for I in range(H // 2 + 1):
        for J in range(W // 2 + 1):
            for dy in range(2):
                for dx in range(2):
                    r, s = 2 * I - 1 + dy, 2 * J - 1 + dx
                    pos = 2 * dy + dx
                    got = np.asarray(yo[:, I, J, pos * CO:(pos + 1) * CO])
                    if 0 <= r < H and 0 <= s < W:
                        np.testing.assert_array_equal(got, np.asarray(y_direct[:, r, s]))
                    else:
                        assert (got == 0).all()


def _pack_odd_reference(y, H, W):
    """Build the odd-packed tensor of a standard (B,H,W,C) tensor with
    zero padding outside the image."""
    B, C = y.shape[0], y.shape[-1]
    yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))  # rows -1..H
    out = np.zeros((B, H // 2 + 1, W // 2 + 1, 4 * C), dtype=np.asarray(y).dtype)
    for I in range(H // 2 + 1):
        for J in range(W // 2 + 1):
            for dy in range(2):
                for dx in range(2):
                    pos = 2 * dy + dx
                    out[:, I, J, pos * C:(pos + 1) * C] = np.asarray(
                        yp[:, 2 * I + dy, 2 * J + dx]
                    )
    return jnp.asarray(out)


def test_odd_to_even_exact(rng):
    """conv A: packed odd->even == direct 3x3."""
    B, H, W, C, CO = 2, 16, 12, 5, 4
    y = rnd_int8(rng, (B, H, W, C))  # pretend this is a conv-B output
    w3 = rnd_int8(rng, (3, 3, C, CO))
    y_direct = direct_conv3(y, w3)

    yo = _pack_odd_reference(y, H, W)
    wp = jnp.asarray(s2d.w3_pack_alt(np.asarray(w3)))
    ye = s2d.conv_odd_to_even(yo, wp)
    np.testing.assert_array_equal(np.asarray(s2d.unpack_even(ye)), np.asarray(y_direct))


def test_chain_exact(rng):
    """Full BasicBlock pattern: conv3-relu-conv3-add == packed chain with
    requant epilogues (integer in, integer out at every step)."""
    B, H, W, C = 2, 16, 16, 6
    x = rnd_int8(rng, (B, H, W, C))
    w1 = rnd_int8(rng, (3, 3, C, C))
    w2 = rnd_int8(rng, (3, 3, C, C))

    def requant(acc):  # toy epilogue: scale + clip, int8 out
        f = acc.astype(jnp.float32) * 0.01
        return jnp.clip(jnp.round(f), -127, 127).astype(jnp.int8)

    # direct
    h1 = requant(jnp.maximum(direct_conv3(x, w1), 0))
    h2 = requant(direct_conv3(h1, w2) + x.astype(jnp.int32) * 50)

    # packed
    xp = s2d.pack_even(x)
    w1p = jnp.asarray(s2d.w3_pack_alt(np.asarray(w1)))
    w2p = jnp.asarray(s2d.w3_pack_alt(np.asarray(w2)))
    mask = s2d.odd_zero_mask(H // 2 + 1, W // 2 + 1, C, dtype=jnp.int32)
    a1 = s2d.conv_even_to_odd(xp, w1p) * mask
    h1p = requant(jnp.maximum(a1, 0))
    h2p = requant(s2d.conv_odd_to_even(h1p, w2p) + xp.astype(jnp.int32) * 50)
    np.testing.assert_array_equal(np.asarray(s2d.unpack_even(h2p)), np.asarray(h2))


def test_std_to_even_exact(rng):
    """Entry conv (k=4 stride 2 on standard input, packed output)."""
    B, H, W, C, CO = 2, 16, 12, 7, 3
    x = rnd_int8(rng, (B, H, W, C))
    w3 = rnd_int8(rng, (3, 3, C, CO))
    y_direct = direct_conv3(x, w3)
    wp = jnp.asarray(s2d.w3_pack_from_std(np.asarray(w3)))
    ye = s2d.conv_std_to_even(x, wp)
    np.testing.assert_array_equal(np.asarray(s2d.unpack_even(ye)), np.asarray(y_direct))


def test_even_down_exact(rng):
    """Exit conv (3x3 stride-2 semantics from an even-packed input)."""
    B, H, W, C, CO = 2, 16, 12, 5, 9
    x = rnd_int8(rng, (B, H, W, C))
    w3 = rnd_int8(rng, (3, 3, C, CO))
    y_direct = direct_conv3(x, w3, stride=2)
    wp = jnp.asarray(s2d.w3_pack_down(np.asarray(w3)))
    y = s2d.conv_even_down(s2d.pack_even(x), wp)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_direct))


def test_1x1_exact(rng):
    B, H, W, C, CO = 2, 8, 8, 6, 10
    x = rnd_int8(rng, (B, H, W, C))
    w1 = rnd_int8(rng, (1, 1, C, CO))
    y_direct = jax.lax.conv_general_dilated(
        x, w1, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    wp = jnp.asarray(s2d.w1_pack(np.asarray(w1)))
    y = s2d.conv_even_1x1(s2d.pack_even(x), wp)
    np.testing.assert_array_equal(np.asarray(s2d.unpack_even(y)), np.asarray(y_direct))


@pytest.mark.parametrize("factor", [2, 4, 8])
def test_upsample_to_even(rng, factor):
    B, h, w, C = 2, 4, 4, 3
    u = rnd_int8(rng, (B, h, w, C)).astype(jnp.float32)
    # direct nearest upsample then even-pack
    big = jnp.broadcast_to(
        u[:, :, None, :, None, :], (B, h, factor, w, factor, C)
    ).reshape(B, h * factor, w * factor, C)
    expect = s2d.pack_even(big)
    got = s2d.upsample_std_to_even(u, factor)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expect))


def test_even3_exact(rng):
    """Even-only scheme: packed 3x3 even->even == direct 3x3."""
    B, H, W, C, CO = 2, 16, 12, 5, 7
    x = rnd_int8(rng, (B, H, W, C))
    w3 = rnd_int8(rng, (3, 3, C, CO))
    y_direct = direct_conv3(x, w3)
    wp = jnp.asarray(s2d.w3_pack_even3(np.asarray(w3)))
    y = s2d.conv_even3(s2d.pack_even(x), wp)
    np.testing.assert_array_equal(np.asarray(s2d.unpack_even(y)), np.asarray(y_direct))


def test_even3_chain_exact(rng):
    """Two even3 convs + residual == direct chain (no alternation)."""
    B, H, W, C = 2, 16, 16, 6
    x = rnd_int8(rng, (B, H, W, C))
    w1 = rnd_int8(rng, (3, 3, C, C))
    w2 = rnd_int8(rng, (3, 3, C, C))

    def requant(acc):
        return jnp.clip(jnp.round(acc.astype(jnp.float32) * 0.01), -127, 127).astype(jnp.int8)

    h1 = requant(jnp.maximum(direct_conv3(x, w1), 0))
    h2 = requant(direct_conv3(h1, w2) + x.astype(jnp.int32) * 50)

    xp = s2d.pack_even(x)
    w1p = jnp.asarray(s2d.w3_pack_even3(np.asarray(w1)))
    w2p = jnp.asarray(s2d.w3_pack_even3(np.asarray(w2)))
    h1p = requant(jnp.maximum(s2d.conv_even3(xp, w1p), 0))
    h2p = requant(s2d.conv_even3(h1p, w2p) + xp.astype(jnp.int32) * 50)
    np.testing.assert_array_equal(np.asarray(s2d.unpack_even(h2p)), np.asarray(h2))
