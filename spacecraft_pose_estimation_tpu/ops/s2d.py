"""Space-to-depth conv formulations for narrow-channel branches.

Why: v5e's MXU has 128 output lanes; a conv with Cout=32 runs at 1/4 of
peak (measured 189.7 TOP/s int8 vs ~788 peak — DEVNOTES round 2). The
HRNet-W32 high-res branch (32ch @128^2, 64 convs in the serving model,
reference topology lib/models/pose_hrnet.py:274-460) therefore sits at a
compute ceiling no per-op schedule can move.

Fix: keep the branch's activations packed 2x2-cell -> channels, so each
3x3/C conv becomes a 2x2/4C conv: 1.78x the MACs at 4x the lane
utilization (~2x net). The trick that makes whole CHAINS work without
repacking is alternating cell alignment:

* even packing:  cell (I, J) holds pixels (2I+dy, 2J+dx), dy,dx in {0,1}
  -> shape (H/2, W/2, 4C)
* odd packing:   cell (I, J) holds pixels (2I-1+dy, 2J-1+dx)
  -> shape (H/2+1, W/2+1, 4C); slots at rows -1 and H (cols -1 and W)
  are structural zeros (they coincide with the 3x3 conv's zero padding).

A 3x3 conv maps even -> odd as a 2x2 conv with SAME-ish padding (1,1),
and odd -> even as a 2x2 VALID conv — in both cases the 4x4-pixel input
window of a 2x2-pixel output cell covers exactly 2x2 cells of the other
alignment. A residual BasicBlock (conv-conv-add, pose_hrnet.py:101) is
even -> odd -> even, so the add stays aligned and a whole module branch
never leaves the packed domain.

Packed channel layout: index = (2*dy+dx)*C + c  (position-major).

All transforms are pure index scatters of the original weights — for
int8 weights the packed conv is BIT-EXACT equal to the direct conv
(integer accumulation over the identical multiset of products).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# activation packing

def pack_even(x: Array) -> Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C) even-aligned cell packing."""
    b, h, w, c = x.shape
    y = x.reshape(b, h // 2, 2, w // 2, 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)  # B, H2, W2, dy, dx, C
    return y.reshape(b, h // 2, w // 2, 4 * c)


def unpack_even(y: Array) -> Array:
    """(B, H2, W2, 4C) -> (B, 2*H2, 2*W2, C)."""
    b, h2, w2, c4 = y.shape
    c = c4 // 4
    x = y.reshape(b, h2, w2, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h2, 2 * w2, c)


def odd_zero_mask(h2p: int, w2p: int, c: int, dtype=jnp.float32) -> Array:
    """(h2p, w2p, 4C) mask zeroing the out-of-image slots of an odd-packed
    tensor (rows -1/H, cols -1/W). h2p = H/2+1, w2p = W/2+1."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (h2p, w2p, 4 * c), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h2p, w2p, 4 * c), 1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (h2p, w2p, 4 * c), 2) // c
    dy, dx = pos // 2, pos % 2
    ok_r = jnp.logical_and(
        jnp.logical_or(rows > 0, dy == 1), jnp.logical_or(rows < h2p - 1, dy == 0)
    )
    ok_c = jnp.logical_and(
        jnp.logical_or(cols > 0, dx == 1), jnp.logical_or(cols < w2p - 1, dx == 0)
    )
    return jnp.logical_and(ok_r, ok_c).astype(dtype)


# ---------------------------------------------------------------------------
# weight transforms (host-side numpy; exact zero-scatter of the original)

def w3_pack_alt(w3: np.ndarray) -> np.ndarray:
    """3x3 (3,3,C,C') -> 2x2 packed (2,2,4C,4C') for the ALTERNATING
    alignment convs (even->odd with padding (1,1), odd->even VALID —
    the same scatter serves both; only the conv padding differs).

    Derivation: with input cell offset di and positions pin=(dyi,dxi),
    pout=(dyo,dxo), the original tap index is ky = 2*di + dyi - dyo
    (and kx analogously); taps outside 0..2 are zero.
    """
    w3 = np.asarray(w3)
    kc, cin, cout = w3.shape[1], w3.shape[2], w3.shape[3]
    assert w3.shape[:2] == (3, 3)
    out = np.zeros((2, 2, 4 * cin, 4 * cout), dtype=w3.dtype)
    for di in range(2):
        for dj in range(2):
            for dyi in range(2):
                for dxi in range(2):
                    for dyo in range(2):
                        for dxo in range(2):
                            ky = 2 * di + dyi - dyo
                            kx = 2 * dj + dxi - dxo
                            if 0 <= ky <= 2 and 0 <= kx <= 2:
                                pin = 2 * dyi + dxi
                                pout = 2 * dyo + dxo
                                out[
                                    di, dj,
                                    pin * cin:(pin + 1) * cin,
                                    pout * cout:(pout + 1) * cout,
                                ] = w3[ky, kx]
    return out


def w3_pack_from_std(w3: np.ndarray, stride: int = 1) -> np.ndarray:
    """3x3 (3,3,C,C') on a STANDARD input -> packed-output conv.

    stride=1: (4,4,C,4C') conv with stride 2, padding (1,1): consumes the
    unpacked (H, W, C) tensor and emits the even-packed (H/2, W/2, 4C')
    output directly (entry point into the packed domain, e.g.
    transition1/adapt0).
    """
    assert stride == 1
    w3 = np.asarray(w3)
    cin, cout = w3.shape[2], w3.shape[3]
    out = np.zeros((4, 4, cin, 4 * cout), dtype=w3.dtype)
    for ky4 in range(4):
        for kx4 in range(4):
            for dyo in range(2):
                for dxo in range(2):
                    ky = ky4 - dyo
                    kx = kx4 - dxo
                    if 0 <= ky <= 2 and 0 <= kx <= 2:
                        pout = 2 * dyo + dxo
                        out[ky4, kx4, :, pout * cout:(pout + 1) * cout] = w3[ky, kx]
    return out


def w3_pack_down(w3: np.ndarray) -> np.ndarray:
    """3x3-stride-2 (3,3,C,C') FROM an even-packed input -> (2,2,4C,C')
    stride-1 conv with padding (1,0): emits the STANDARD half-res output
    (exit from the packed domain, e.g. fuse down chains).

    out(r) needs input rows 2r-1..2r+1 = even cells {r-1, r};
    ky = 2*di + dyi - 1.
    """
    w3 = np.asarray(w3)
    cin, cout = w3.shape[2], w3.shape[3]
    out = np.zeros((2, 2, 4 * cin, cout), dtype=w3.dtype)
    for di in range(2):
        for dj in range(2):
            for dyi in range(2):
                for dxi in range(2):
                    ky = 2 * di + dyi - 1
                    kx = 2 * dj + dxi - 1
                    if 0 <= ky <= 2 and 0 <= kx <= 2:
                        pin = 2 * dyi + dxi
                        out[di, dj, pin * cin:(pin + 1) * cin, :] = w3[ky, kx]
    return out


def w1_pack(w1: np.ndarray) -> np.ndarray:
    """1x1 (C,C') -> block-diagonal (1,1,4C,4C') same-alignment conv."""
    w1 = np.asarray(w1)
    if w1.ndim == 4:
        w1 = w1[0, 0]
    cin, cout = w1.shape
    out = np.zeros((1, 1, 4 * cin, 4 * cout), dtype=w1.dtype)
    for p in range(4):
        out[0, 0, p * cin:(p + 1) * cin, p * cout:(p + 1) * cout] = w1
    return out


def tile_vec(v: np.ndarray) -> np.ndarray:
    """Per-output-channel vector (C',) -> packed (4C',)."""
    return np.tile(np.asarray(v), 4)


# ---------------------------------------------------------------------------
# packed-domain ops (XLA convs over the transformed weights)

def _conv(x, w, stride, padding, int8: bool):
    kw = dict(dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if int8:
        kw["preferred_element_type"] = jnp.int32
    return jax.lax.conv_general_dilated(x, w, (stride, stride), padding, **kw)


def conv_even_to_odd(x_even: Array, w_packed: Array, int8: bool = True) -> Array:
    """(B,H2,W2,4C) even -> (B,H2+1,W2+1,4C') odd. Caller applies the
    requant epilogue, then MUST zero the structural slots with
    :func:`odd_zero_mask` (or fold the mask into the epilogue)."""
    return _conv(x_even, w_packed, 1, [(1, 1), (1, 1)], int8)


def conv_odd_to_even(x_odd: Array, w_packed: Array, int8: bool = True) -> Array:
    """(B,H2+1,W2+1,4C) odd -> (B,H2,W2,4C') even (VALID)."""
    return _conv(x_odd, w_packed, 1, [(0, 0), (0, 0)], int8)


def conv_std_to_even(x_std: Array, w_packed4: Array, int8: bool = True) -> Array:
    """(B,H,W,C) standard -> (B,H/2,W/2,4C') even (k=4, stride 2)."""
    return _conv(x_std, w_packed4, 2, [(1, 1), (1, 1)], int8)


def conv_even_down(x_even: Array, w_packed: Array, int8: bool = True) -> Array:
    """(B,H2,W2,4C) even -> (B,H2,W2,C') standard half-res (the packed
    equivalent of a 3x3 stride-2 conv)."""
    return _conv(x_even, w_packed, 1, [(1, 0), (1, 0)], int8)


def conv_even_1x1(x_even: Array, w_packed1: Array, int8: bool = True) -> Array:
    """Block-diagonal 1x1: even -> even."""
    return _conv(x_even, w_packed1, 1, [(0, 0), (0, 0)], int8)


def upsample_std_to_even(u: Array, factor: int) -> Array:
    """Nearest-upsample a standard (B,h,w,C) tensor by ``factor`` and
    deliver it even-packed at resolution (factor*h): spatial nearest by
    factor/2 followed by a 4x channel tile (the 2x2 cell replication).
    Stays a pure broadcast chain — XLA fuses it into the consuming add.
    """
    b, h, w, c = u.shape
    if factor > 2:
        f = factor // 2
        u = jnp.broadcast_to(
            u[:, :, None, :, None, :], (b, h, f, w, f, c)
        ).reshape(b, h * f, w * f, c)
    return jnp.tile(u, (1, 1, 1, 4))


def w3_pack_even3(w3: np.ndarray) -> np.ndarray:
    """3x3 (3,3,C,C') -> 3x3 packed (3,3,4C,4C') EVEN->EVEN conv
    (padding (1,1)).

    The even-only scheme: 4x the MACs of the direct conv (the 3x3-cell
    window covers a 6x6-pixel region of which only 4x4 is used — the
    rest is zero weights), but every conv runs 128 lanes wide on clean
    power-of-two shapes with no odd-alignment intermediates. Measured
    faster than both the direct conv AND the alternating 2x2 scheme on
    v5e (probe_r3: 0.435 ms vs 0.579 direct for the 128^2x32 shape).

    Derivation: output even cell I pos dyo -> output row 2I+dyo needs
    input rows 2I+dyo-1..+1 = even cells I-1..I+1; with cell offset
    di in {0,1,2}: ky = 2*di + dyi - dyo - 1.
    """
    w3 = np.asarray(w3)
    cin, cout = w3.shape[2], w3.shape[3]
    out = np.zeros((3, 3, 4 * cin, 4 * cout), dtype=w3.dtype)
    for di in range(3):
        for dj in range(3):
            for dyi in range(2):
                for dxi in range(2):
                    for dyo in range(2):
                        for dxo in range(2):
                            ky = 2 * di + dyi - dyo - 1
                            kx = 2 * dj + dxi - dxo - 1
                            if 0 <= ky <= 2 and 0 <= kx <= 2:
                                pin = 2 * dyi + dxi
                                pout = 2 * dyo + dxo
                                out[
                                    di, dj,
                                    pin * cin:(pin + 1) * cin,
                                    pout * cout:(pout + 1) * cout,
                                ] = w3[ky, kx]
    return out


def conv_even3(x_even: Array, w_packed3: Array, int8: bool = True) -> Array:
    """(B,H2,W2,4C) even -> (B,H2,W2,4C') even (3x3 SAME)."""
    return _conv(x_even, w_packed3, 1, [(1, 1), (1, 1)], int8)
