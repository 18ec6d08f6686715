"""Fused int8 residual-block chains as a single Pallas TPU kernel.

Why: the per-op int8 HRNet is ALREADY at its XLA roofline (measured 83.5
ms vs a 72.4 ms static ceiling for batch 128 at 512^2, devbench/
roofline_int8.py) — every BasicBlock costs two conv round-trips through
HBM plus a residual-add round-trip. This kernel keeps one image's
activation tile resident in VMEM across a WHOLE branch chain (e.g. the
4 BasicBlocks of one HRNet module-branch = 8 convs + 4 adds): HBM
traffic drops from 2*(2*nblocks)+3*nblocks tensor passes to exactly one
read + one write.

Per conv the kernel computes the same math as models/hrnet_int8.py's
_Int8Ops.convbn/add sites:

    y_i32  = conv3x3(x_i8, w_i8)                (9 shifted MXU dots)
    f      = y_i32 * m + b                      (per-channel f32)
    x_next = clip(round(relu?(f)), -127, 127)   (int8)
    block out = clip(round(relu(y2*m2 + b2 + coeff * x_in)), ...)

Weights/scales for all blocks ride in VMEM (a few hundred KB); the
grid runs one image per step. Accuracy: bit-identical to the XLA walk
up to f32 rounding order (tests/test_pallas_blocks.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only import guard (tests run in interpreter mode on CPU)
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

Array = jax.Array


def _conv3x3_i8(xpad, w, h, wdt, c_out):
    """xpad: (H+2, W+2, C) int8 VMEM value; w: (3, 3, C, Cout) int8.
    Returns (H*W, Cout) int32 — nine shifted MXU contractions."""
    acc = jnp.zeros((h * wdt, c_out), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            win = xpad[dy : dy + h, dx : dx + wdt, :]
            a = win.reshape(h * wdt, xpad.shape[-1])
            acc = acc + jax.lax.dot_general(
                a,
                w[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
    return acc


def _requant(f):
    return jnp.clip(jnp.round(f), -127, 127).astype(jnp.int8)


def _block_chain_kernel(
    x_ref, w_ref, m_ref, b_ref, coef_ref, out_ref, *, nblocks, h, wdt, c
):
    # x_ref: (1, H, W, C) int8; w_ref: (nblocks, 2, 3, 3, C, C) int8;
    # m_ref/b_ref: (nblocks, 2, C) f32; coef_ref: (nblocks, 2) f32
    x = x_ref[0]
    for blk in range(nblocks):
        xpad = jnp.zeros((h + 2, wdt + 2, c), jnp.int8)
        xpad = jax.lax.dynamic_update_slice(xpad, x, (1, 1, 0))
        y = _conv3x3_i8(xpad, w_ref[blk, 0], h, wdt, c)
        f = y.astype(jnp.float32) * m_ref[blk, 0] + b_ref[blk, 0]
        x1 = _requant(jnp.maximum(f, 0.0))

        x1pad = jnp.zeros((h + 2, wdt + 2, c), jnp.int8)
        x1pad = jax.lax.dynamic_update_slice(
            x1pad, x1.reshape(h, wdt, c), (1, 1, 0)
        )
        y2 = _conv3x3_i8(x1pad, w_ref[blk, 1], h, wdt, c)
        f2 = y2.astype(jnp.float32) * m_ref[blk, 1] + b_ref[blk, 1]
        # conv2 output is requantized to int8 BEFORE the add — exactly
        # the _Int8Ops walk (convbn then add site), so results match the
        # XLA path bit-for-bit including the intermediate rounding
        x2 = _requant(f2).reshape(h, wdt, c)
        f_out = x2.astype(jnp.float32) * coef_ref[blk, 0] + x.astype(
            jnp.float32
        ) * coef_ref[blk, 1]
        x = _requant(jnp.maximum(f_out, 0.0))
    out_ref[0] = x


@functools.partial(
    jax.jit, static_argnames=("nblocks", "interpret")
)
def fused_basic_block_chain(
    x: Array,  # (B, H, W, C) int8
    weights: Array,  # (nblocks, 2, 3, 3, C, C) int8
    mult: Array,  # (nblocks, 2, C) f32   (conv requant multiplier)
    bias: Array,  # (nblocks, 2, C) f32
    coeffs: Array,  # (nblocks, 2) f32     (add-site [y, residual] coeffs)
    nblocks: int,
    interpret: bool | None = None,
) -> Array:
    """Runs `nblocks` BasicBlocks over x, one grid step per image."""
    b, h, wdt, c = x.shape
    on_tpu = jax.devices()[0].platform == "tpu"
    kernel = functools.partial(
        _block_chain_kernel, nblocks=nblocks, h=h, wdt=wdt, c=c
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, wdt, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec(weights.shape, lambda i: (0,) * weights.ndim),
            pl.BlockSpec(mult.shape, lambda i: (0, 0, 0)),
            pl.BlockSpec(bias.shape, lambda i: (0, 0, 0)),
            pl.BlockSpec(coeffs.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, wdt, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int8),
        interpret=not on_tpu if interpret is None else interpret,
    )(x, weights, mult, bias, coeffs)


def chain_params_from_q(q: dict, prefix: str, branch: int, nblocks: int):
    """Collect one module-branch's BasicBlock params from the quantized
    tree (models/hrnet_int8.py layout) into the kernel's stacked arrays.

    Returns (weights, mult, bias, coeffs) or None when any block has a
    'down' projection (never the case for HRNet BasicBlock branches).
    """
    ws, ms, bs, cs = [], [], [], []
    for k in range(nblocks):
        bn = f"{prefix}/branch{branch}/block{k}"
        if f"{bn}/down" in q["convs"]:
            return None
        c1 = q["convs"][f"{bn}/conv1"]
        c2 = q["convs"][f"{bn}/conv2"]
        add = q["adds"][bn]
        ws.append(jnp.stack([c1["w8"], c2["w8"]]))
        ms.append(jnp.stack([c1["m"], c2["m"]]))
        bs.append(jnp.stack([c1["b"], c2["b"]]))
        cs.append(jnp.asarray(add["coeffs"], jnp.float32))
    return (
        jnp.stack(ws),
        jnp.stack(ms),
        jnp.stack(bs),
        jnp.stack(cs),
    )
