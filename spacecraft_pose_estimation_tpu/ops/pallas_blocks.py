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


def _requant(f):
    return jnp.clip(jnp.round(f), -127, 127).astype(jnp.int8)


def _conv3x3_rows(pad_ref, w, r0, rows, wdt, c_out):
    """Conv rows [r0, r0+rows) from a padded scratch ref. r0 may be a
    traced index (pl.ds); rows is static. Returns (rows*W, Cout) i32.

    Three contractions, not nine: the 3 dy taps are stacked along the
    channel axis once (K = 3*Cin — also a 3x better MXU contraction
    fill at Cin=32), then each dx is a column slice + one dot. Keeping
    only ONE stacked window live (instead of 9 shifted slices) is what
    holds Mosaic's scoped-VMEM stack under the 16 MB limit."""
    cin = pad_ref.shape[-1]
    stacked = jnp.concatenate(
        [pad_ref[pl.ds(r0 + dy, rows), :, :] for dy in range(3)], axis=-1
    )  # (rows, W+2, 3*Cin), dy-major channel order
    acc = jnp.zeros((rows * wdt, c_out), jnp.int32)
    for dx in range(3):
        win = stacked[:, dx : dx + wdt, :].reshape(rows * wdt, 3 * cin)
        acc = acc + jax.lax.dot_general(
            win,
            w[:, dx].reshape(3 * cin, c_out),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    return acc


def _block_chain_kernel(
    x_ref, w_ref, m_ref, b_ref, coef_ref, out_ref, pad_ref, pad2_ref,
    *, nblocks, h, wdt, c, row_chunk
):
    # x_ref: (1, H, W, C) int8; w_ref: (nblocks, 2, 3, 3, C, C) int8;
    # m_ref/b_ref: (nblocks, 2, C) f32; coef_ref: (nblocks, 2) f32;
    # pad_ref/pad2_ref: (H+2, W+2, C) int8 scratch (borders stay zero).
    #
    # VMEM discipline: activations LIVE IN SCRATCH REFS (packed int8);
    # only row-chunk values are materialized (Mosaic widens int8 values
    # to 32-bit vregs, so whole-image values blow the 16 MB budget).
    pad_ref[...] = jnp.zeros((h + 2, wdt + 2, c), jnp.int8)
    pad2_ref[...] = jnp.zeros((h + 2, wdt + 2, c), jnp.int8)
    pad_ref[1 : h + 1, 1 : wdt + 1, :] = x_ref[0]
    n_chunks = h // row_chunk  # h is a multiple of row_chunk (caller)
    for blk in range(nblocks):
        # conv1 (+relu) rows -> pad2 interior. fori_loop (not an
        # unrolled python loop): Mosaic's stack-liveness accounting is
        # per-iteration, keeping scoped VMEM ~1-2 MB
        def conv1_body(i, _, blk=blk):
            r0 = i * row_chunk
            y = _conv3x3_rows(pad_ref, w_ref[blk, 0], r0, row_chunk, wdt, c)
            f = y.astype(jnp.float32) * m_ref[blk, 0] + b_ref[blk, 0]
            pad2_ref[pl.ds(1 + r0, row_chunk), 1 : wdt + 1, :] = _requant(
                jnp.maximum(f, 0.0)
            ).reshape(row_chunk, wdt, c)
            return 0

        jax.lax.fori_loop(0, n_chunks, conv1_body, 0)

        # conv2 + requant + residual add (+relu) rows -> pad interior
        # (in-place: residual rows are consumed exactly once, and conv2
        # reads only pad2)
        def conv2_body(i, _, blk=blk):
            r0 = i * row_chunk
            y2 = _conv3x3_rows(pad2_ref, w_ref[blk, 1], r0, row_chunk, wdt, c)
            f2 = y2.astype(jnp.float32) * m_ref[blk, 1] + b_ref[blk, 1]
            # conv2 output is requantized BEFORE the add — matches the
            # _Int8Ops walk bit-for-bit incl. intermediate rounding
            x2 = _requant(f2).reshape(row_chunk, wdt, c)
            res = pad_ref[pl.ds(1 + r0, row_chunk), 1 : wdt + 1, :]
            f_out = x2.astype(jnp.float32) * coef_ref[blk, 0] + res.astype(
                jnp.float32
            ) * coef_ref[blk, 1]
            pad_ref[pl.ds(1 + r0, row_chunk), 1 : wdt + 1, :] = _requant(
                jnp.maximum(f_out, 0.0)
            )
            return 0

        jax.lax.fori_loop(0, n_chunks, conv2_body, 0)
    out_ref[0] = pad_ref[1 : h + 1, 1 : wdt + 1, :]


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
    # row-chunk so chunk VALUES stay ~1 MB after Mosaic's int8->32-bit
    # vreg widening; must divide h evenly for the in-kernel fori_loop
    row_chunk = max(8, min(h, (1 << 19) // max(wdt * c * 4, 1)))
    while h % row_chunk:
        row_chunk -= 1
    kernel = functools.partial(
        _block_chain_kernel, nblocks=nblocks, h=h, wdt=wdt, c=c,
        row_chunk=row_chunk,
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
        scratch_shapes=[
            pltpu.VMEM((h + 2, wdt + 2, c), jnp.int8),
            pltpu.VMEM((h + 2, wdt + 2, c), jnp.int8),
        ],
        interpret=not on_tpu if interpret is None else interpret,
    )(x, weights, mult, bias, coeffs)


def _dot_i8(a, w):
    return jax.lax.dot_general(
        a, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def _bottleneck_chain_kernel(
    x_ref,
    w1_ref, m1_ref, b1_ref,      # (nblocks, Cin_max, Cm) packed 1x1 conv1
    w2_ref, m2_ref, b2_ref,      # (nblocks, 3, 3, Cm, Cm)
    w3_ref, m3_ref, b3_ref,      # (nblocks, Cm, Cout)
    wd_ref, md_ref, bd_ref,      # (Cin0, Cout) block-0 shortcut
    coef_ref,                    # (nblocks, 2)
    out_ref,
    xs_ref,                      # (H, W, Cout) int8 scratch: running act
    pad_ref,                     # (H+2, W+2, Cm) int8 scratch
    x2s_ref,                     # (H, W, Cm) int8 scratch
    *, nblocks, h, wdt, cin0, cm, cout, row_chunk,
):
    # Row-chunked, scratch-resident (see _block_chain_kernel note on
    # Mosaic's int8->32-bit value widening).
    pad_ref[...] = jnp.zeros((h + 2, wdt + 2, cm), jnp.int8)

    def rows_of(ref, r0, rows, ch):
        return ref[r0 : r0 + rows, :, :].reshape(rows * wdt, ch)

    for blk in range(nblocks):
        kin = cin0 if blk == 0 else cout
        # conv1 1x1 (+relu) -> pad interior
        for r0 in range(0, h, row_chunk):
            rows = min(row_chunk, h - r0)
            src = (
                x_ref[0, r0 : r0 + rows, :, :].reshape(rows * wdt, cin0)
                if blk == 0
                else rows_of(xs_ref, r0, rows, cout)
            )
            f1 = _dot_i8(src, w1_ref[blk, :kin, :]).astype(jnp.float32)
            pad_ref[1 + r0 : 1 + r0 + rows, 1 : wdt + 1, :] = _requant(
                jnp.maximum(f1 * m1_ref[blk] + b1_ref[blk], 0.0)
            ).reshape(rows, wdt, cm)
        # conv2 3x3 (+relu) -> x2 scratch
        for r0 in range(0, h, row_chunk):
            rows = min(row_chunk, h - r0)
            y2 = _conv3x3_rows(pad_ref, w2_ref[blk], r0, rows, wdt, cm)
            x2s_ref[r0 : r0 + rows, :, :] = _requant(
                jnp.maximum(y2.astype(jnp.float32) * m2_ref[blk] + b2_ref[blk], 0.0)
            ).reshape(rows, wdt, cm)
        # conv3 1x1 + (block-0 shortcut) + add (+relu) -> xs scratch
        # (in-place: residual rows consumed once per row chunk)
        for r0 in range(0, h, row_chunk):
            rows = min(row_chunk, h - r0)
            f3 = _dot_i8(
                rows_of(x2s_ref, r0, rows, cm), w3_ref[blk]
            ).astype(jnp.float32)
            x3 = _requant(f3 * m3_ref[blk] + b3_ref[blk])
            if blk == 0:
                x0r = x_ref[0, r0 : r0 + rows, :, :].reshape(rows * wdt, cin0)
                fr = _dot_i8(x0r, wd_ref[...]).astype(jnp.float32)
                r = _requant(fr * md_ref[...] + bd_ref[...])
            else:
                r = rows_of(xs_ref, r0, rows, cout)
            f = x3.astype(jnp.float32) * coef_ref[blk, 0] + r.astype(
                jnp.float32
            ) * coef_ref[blk, 1]
            xs_ref[r0 : r0 + rows, :, :] = _requant(
                jnp.maximum(f, 0.0)
            ).reshape(rows, wdt, cout)
    out_ref[0] = xs_ref[...]


@functools.partial(jax.jit, static_argnames=("nblocks", "chunk", "interpret"))
def fused_bottleneck_chain(
    x: Array,          # (B, H, W, Cin0) int8
    w1: Array, m1: Array, b1: Array,   # (n, Cin_max, Cm) / (n, Cm)
    w2: Array, m2: Array, b2: Array,   # (n, 3, 3, Cm, Cm) / (n, Cm)
    w3: Array, m3: Array, b3: Array,   # (n, Cm, Cout) / (n, Cout)
    wd: Array, md: Array, bd: Array,   # (Cin0, Cout) / (Cout,)
    coeffs: Array,                     # (n, 2)
    nblocks: int,
    chunk: int = 64,
    interpret: bool | None = None,
) -> Array:
    """HRNet layer1: the 4-Bottleneck chain (stem res, 64->64->256 with a
    block-0 projection shortcut) fused into one VMEM-resident kernel.
    Per-op this chain moves ~16 ms of HBM traffic at b128 (the largest
    IO item in the int8 roofline); fused it reads the 64-ch input once
    and writes the 256-ch output once per image."""
    b, h, wdt, cin0 = x.shape
    cm = w2.shape[-1]
    cout = w3.shape[-1]
    on_tpu = jax.devices()[0].platform == "tpu"
    row_chunk = max(8, min(h, (1 << 20) // max(wdt * cout * 4, 1)))
    kernel = functools.partial(
        _bottleneck_chain_kernel,
        nblocks=nblocks, h=h, wdt=wdt, cin0=cin0, cm=cm, cout=cout,
        row_chunk=row_chunk,
    )
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, wdt, cin0), lambda i: (i, 0, 0, 0)),
            full(w1), full(m1), full(b1),
            full(w2), full(m2), full(b2),
            full(w3), full(m3), full(b3),
            full(wd), full(md), full(bd),
            full(coeffs),
        ],
        out_specs=pl.BlockSpec((1, h, wdt, cout), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, wdt, cout), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((h, wdt, cout), jnp.int8),
            pltpu.VMEM((h + 2, wdt + 2, cm), jnp.int8),
            pltpu.VMEM((h, wdt, cm), jnp.int8),
        ],
        interpret=not on_tpu if interpret is None else interpret,
    )(x, w1, m1, b1, w2, m2, b2, w3, m3, b3, wd, md, bd, coeffs)


def _bottleneck_strip_kernel(
    x_ref,                        # (B*(H+2*halo), W, Cin0) int8 in HBM (ANY);
                                  # 3-D on purpose — 4-D ANY-ref DMA slicing
                                  # crashed the Mosaic compile helper
    w1_ref, m1_ref, b1_ref,
    w2_ref, m2_ref, b2_ref,
    w3_ref, m3_ref, b3_ref,
    wd_ref, md_ref, bd_ref,
    coef_ref,
    out_ref,                      # block (1, strip, W, Cout)
    x0s_ref,                      # (rows, W, Cin0) int8 scratch
    pad_ref,                      # (rows+2, W+2, Cm) int8 scratch
    x2s_ref,                      # (rows, W, Cm) int8 scratch
    xss_ref,                      # (rows, W, Cout) int8 scratch
    sem,
    *, nblocks, strip, halo, wdt, cin0, cm, cout,
):
    """Strip-mined layer1 chain: one (strip+2*halo)-row slab per grid
    step. Row validity shrinks by 1 per 3x3 conv (halo = nblocks), so
    rows [halo, halo+strip) of the final activation are exact; edge rows
    beyond the slab read the caller's zero padding, matching the conv
    zero-pad semantics at true image boundaries."""
    b = pl.program_id(0)
    si = pl.program_id(1)
    rows = strip + 2 * halo
    hp = pl.num_programs(1) * strip + 2 * halo  # padded image height
    cp = pltpu.make_async_copy(
        x_ref.at[pl.ds(b * hp + si * strip, rows), :, :], x0s_ref, sem
    )
    cp.start()
    cp.wait()
    pad_ref[...] = jnp.zeros((rows + 2, wdt + 2, cm), jnp.int8)

    # block 0 reads the narrow x0 input + projection shortcut; it stays
    # outside the loop (different input width); blocks 1.. run under
    # fori_loop so the Mosaic program stays small (the fully unrolled
    # 4-block version hung the remote compile helper)
    def run_block(blk, src_flat, residual_flat):
        # ref-level dynamic indexing (w_ref[blk]) — dynamic_slice on
        # VALUES has no Pallas-TPU lowering
        f1 = _dot_i8(
            src_flat, w1_ref[blk, : src_flat.shape[1], :]
        ).astype(jnp.float32)
        pad_ref[1 : rows + 1, 1 : wdt + 1, :] = _requant(
            jnp.maximum(f1 * m1_ref[blk] + b1_ref[blk], 0.0)
        ).reshape(rows, wdt, cm)
        y2 = _conv3x3_rows(pad_ref, w2_ref[blk], 0, rows, wdt, cm)
        x2s_ref[...] = _requant(
            jnp.maximum(y2.astype(jnp.float32) * m2_ref[blk] + b2_ref[blk], 0.0)
        ).reshape(rows, wdt, cm)
        f3 = _dot_i8(
            x2s_ref[...].reshape(rows * wdt, cm), w3_ref[blk]
        ).astype(jnp.float32)
        x3 = _requant(f3 * m3_ref[blk] + b3_ref[blk])
        cf = coef_ref[blk]
        f = x3.astype(jnp.float32) * cf[0] + residual_flat.astype(jnp.float32) * cf[1]
        xss_ref[...] = _requant(jnp.maximum(f, 0.0)).reshape(rows, wdt, cout)

    x0_flat = x0s_ref[...].reshape(rows * wdt, cin0)
    fr = _dot_i8(x0_flat, wd_ref[...]).astype(jnp.float32)
    shortcut = _requant(fr * md_ref[...] + bd_ref[...])
    run_block(0, x0_flat, shortcut)

    def body(blk, _):
        run_block(blk, xss_ref[...].reshape(rows * wdt, cout),
                  xss_ref[...].reshape(rows * wdt, cout))
        return 0

    jax.lax.fori_loop(1, nblocks, body, 0)
    out_ref[0] = xss_ref[halo : halo + strip, :, :]


@functools.partial(jax.jit, static_argnames=("nblocks", "strip", "interpret"))
def fused_bottleneck_chain_strips(
    x: Array,          # (B, H, W, Cin0) int8
    w1: Array, m1: Array, b1: Array,
    w2: Array, m2: Array, b2: Array,
    w3: Array, m3: Array, b3: Array,
    wd: Array, md: Array, bd: Array,
    coeffs: Array,
    nblocks: int,
    strip: int = 32,
    interpret: bool | None = None,
) -> Array:
    """Strip-mined fused layer1 (see _bottleneck_strip_kernel). Unlike
    `fused_bottleneck_chain` (whole image resident, 20.2 MB scoped at
    128^2x256 — over the 16 MB VMEM budget), strips keep scoped VMEM at
    ~6 MB for any resolution, at the cost of 2*halo/strip redundant conv
    rows (25% at strip=32, halo=4)."""
    b, h, wdt, cin0 = x.shape
    cm = w2.shape[-1]
    cout = w3.shape[-1]
    halo = nblocks  # one row of validity per 3x3 conv
    assert h % strip == 0, (h, strip)
    # pad input channels to the int8 lane tile (128): a lane-dim DMA
    # slice of a narrower array is rejected by Mosaic ("slice shape
    # along dimension 2 must be aligned to tiling"); the extra channels
    # are zeros against zero weight rows — exact
    cpad = (-cin0) % 128
    if cpad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cpad)))
        wd = jnp.pad(wd, ((0, cpad), (0, 0)))
        if w1.shape[1] < cin0 + cpad:
            w1 = jnp.pad(w1, ((0, 0), (0, cin0 + cpad - w1.shape[1]), (0, 0)))
        cin0 = cin0 + cpad
    xp = jnp.pad(x, ((0, 0), (halo, halo), (0, 0), (0, 0)))
    xp = xp.reshape(b * (h + 2 * halo), wdt, cin0)  # 3-D for the DMA ref
    rows = strip + 2 * halo
    on_tpu = jax.devices()[0].platform == "tpu"
    kernel = functools.partial(
        _bottleneck_strip_kernel,
        nblocks=nblocks, strip=strip, halo=halo, wdt=wdt, cin0=cin0,
        cm=cm, cout=cout,
    )
    full = lambda a: pl.BlockSpec(a.shape, lambda i, j: (0,) * a.ndim)
    return pl.pallas_call(
        kernel,
        grid=(b, h // strip),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            full(w1), full(m1), full(b1),
            full(w2), full(m2), full(b2),
            full(w3), full(m3), full(b3),
            full(wd), full(md), full(bd),
            full(coeffs),
        ],
        out_specs=pl.BlockSpec((1, strip, wdt, cout), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, wdt, cout), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((rows, wdt, cin0), jnp.int8),
            pltpu.VMEM((rows + 2, wdt + 2, cm), jnp.int8),
            pltpu.VMEM((rows, wdt, cm), jnp.int8),
            pltpu.VMEM((rows, wdt, cout), jnp.int8),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=not on_tpu if interpret is None else interpret,
    )(xp, w1, m1, b1, w2, m2, b2, w3, m3, b3, wd, md, bd, coeffs)


def bottleneck_params_from_q(q: dict, nblocks: int):
    """Pack layer1's quantized sites for `fused_bottleneck_chain`.

    conv1 input widths differ per block (64 for block0, 256 after); the
    packed w1 is zero-padded to the max input width — zero rows
    contribute nothing to the int32 dot."""
    convs = q["convs"]
    if "layer1/block0/down" not in convs:
        return None
    cm = convs["layer1/block0/conv2"]["w8"].shape[-1]
    cout = convs["layer1/block0/conv3"]["w8"].shape[-1]
    cin_max = max(
        convs[f"layer1/block{k}/conv1"]["w8"].shape[-2] for k in range(nblocks)
    )
    w1s, m1s, b1s, w2s, m2s, b2s, w3s, m3s, b3s, cfs = ([] for _ in range(10))
    for k in range(nblocks):
        c1 = convs[f"layer1/block{k}/conv1"]
        c2 = convs[f"layer1/block{k}/conv2"]
        c3 = convs[f"layer1/block{k}/conv3"]
        w1 = c1["w8"][0, 0]  # (Cin, Cm)
        pad = cin_max - w1.shape[0]
        if pad:
            w1 = jnp.pad(w1, ((0, pad), (0, 0)))
        w1s.append(w1)
        m1s.append(c1["m"]); b1s.append(c1["b"])
        w2s.append(c2["w8"]); m2s.append(c2["m"]); b2s.append(c2["b"])
        w3s.append(c3["w8"][0, 0]); m3s.append(c3["m"]); b3s.append(c3["b"])
        cfs.append(jnp.asarray(q["adds"][f"layer1/block{k}"]["coeffs"], jnp.float32))
    d = convs["layer1/block0/down"]
    return dict(
        w1=jnp.stack(w1s), m1=jnp.stack(m1s), b1=jnp.stack(b1s),
        w2=jnp.stack(w2s), m2=jnp.stack(m2s), b2=jnp.stack(b2s),
        w3=jnp.stack(w3s), m3=jnp.stack(m3s), b3=jnp.stack(b3s),
        wd=d["w8"][0, 0], md=d["m"], bd=d["b"],
        coeffs=jnp.stack(cfs),
    )


def _up_add_kernel(*refs, n_down, n_up, h, wdt, c, factors):
    """refs layout: yi, d_0..d_{n_down-1}, (u_j, wu_j, mu_j, bu_j) x n_up,
    coeffs, out. Computes the fuse-exchange output for one branch:
        relu(yi*c0 + sum(d_k * c_k) + sum(upsample(requant(1x1(u_j)))*c_j))
    with every intermediate in VMEM (the per-op walk writes each 1x1
    output, each upsample, and the add operands through HBM)."""
    idx = 0
    yi = refs[idx][0]; idx += 1
    downs = []
    for _ in range(n_down):
        downs.append(refs[idx][0]); idx += 1
    ups = []
    for _ in range(n_up):
        ups.append(
            (refs[idx][0], refs[idx + 1][...], refs[idx + 2][...], refs[idx + 3][...])
        )
        idx += 4
    coef = refs[idx]; idx += 1
    out_ref = refs[idx]

    acc = yi.astype(jnp.float32) * coef[0]
    ci = 1
    for d in downs:
        acc = acc + d.astype(jnp.float32) * coef[ci]
        ci += 1
    for (u, wu, mu, bu), factor in zip(ups, factors):
        uh, uw, uc = u.shape
        f = _dot_i8(u.reshape(uh * uw, uc), wu).astype(jnp.float32) * mu + bu
        q8 = _requant(f).reshape(uh, uw, c)
        # nearest upsample as a broadcasting add on the 5-D view — no
        # materialized big tensor, no dynamic_update_slice
        acc5 = acc.reshape(uh, factor, uw, factor, c)
        acc5 = acc5 + q8[:, None, :, None, :].astype(jnp.float32) * coef[ci]
        acc = acc5.reshape(h, wdt, c)
        ci += 1
    out_ref[0] = _requant(jnp.maximum(acc, 0.0))


def fused_up_exchange(
    yi: Array,                      # (B, H, W, C) int8 — identity operand
    downs: list,                    # already-at-res-i int8 operands
    ups: list,                      # [(y_j (B,hj,wj,cj) int8, w (cj,C) i8, m, b)]
    coeffs: Array,                  # (1 + len(downs) + len(ups),) f32
    interpret: bool | None = None,
) -> Array:
    """Fuse-layer exchange for one output branch (HRModule fuse out_i):
    1x1 convs of coarser branches + nearest-upsample + n-way weighted add
    + relu in ONE kernel pass (per-op: each up conv, each upsample and
    the add all round-trip HBM at the destination resolution)."""
    b, h, wdt, c = yi.shape
    factors = tuple(h // u[0].shape[1] for u in ups)
    on_tpu = jax.devices()[0].platform == "tpu"
    kernel = functools.partial(
        _up_add_kernel, n_down=len(downs), n_up=len(ups), h=h, wdt=wdt, c=c,
        factors=factors,
    )
    operands = [yi, *downs]
    in_specs = [
        pl.BlockSpec(
            (1,) + tuple(a.shape[1:]),
            (lambda i, nd=a.ndim: (i,) + (0,) * (nd - 1)),
        )
        for a in operands
    ]
    flat_ups = []
    for (u, wu, mu, bu) in ups:
        flat_ups += [u, wu, mu, bu]
        in_specs += [
            pl.BlockSpec((1,) + tuple(u.shape[1:]), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec(wu.shape, lambda i: (0, 0)),
            pl.BlockSpec(mu.shape, lambda i: (0,)),
            pl.BlockSpec(bu.shape, lambda i: (0,)),
        ]
    in_specs.append(pl.BlockSpec(coeffs.shape, lambda i: (0,)))
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, wdt, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, wdt, c), jnp.int8),
        interpret=not on_tpu if interpret is None else interpret,
    )(*operands, *flat_ups, coeffs)


def chain_params_even3_from_q(q: dict, prefix: str, branch: int, nblocks: int):
    """Collect one branch's BasicBlock chain in the even3-PACKED domain
    (ops/s2d.py): stacked (nblocks, 2, 3, 3, 4C, 4C) weights + tiled
    requant vectors for `fused_basic_block_chain`.

    Why this beats both parents: the std-layout chain kernel is starved
    by N=32/K=96 in-kernel dots (~12% MXU), and the per-op even3 walk
    pays an HBM round-trip per conv. Packed the dots are K=384/N=128
    (full lanes) AND the chain stays VMEM-resident. Returns None when a
    block lacks a packed twin or has a projection shortcut."""
    convs = q.get("convs_s2d") or {}
    ws, ms, bs, cs = [], [], [], []
    for k in range(nblocks):
        bn = f"{prefix}/branch{branch}/block{k}"
        if f"{bn}/down" in q["convs"]:
            return None
        c1, c2 = convs.get(f"{bn}/conv1"), convs.get(f"{bn}/conv2")
        if c1 is None or c2 is None:
            return None
        if c1["w8p"].shape[0] != 3 or c2["w8p"].shape[0] != 3:
            return None  # alt-scheme 2x2 packing: not chain-fusable
        ws.append(jnp.stack([c1["w8p"], c2["w8p"]]))
        ms.append(jnp.stack([c1["m"], c2["m"]]))
        bs.append(jnp.stack([c1["b"], c2["b"]]))
        cs.append(jnp.asarray(q["adds"][bn]["coeffs"], jnp.float32))
    return jnp.stack(ws), jnp.stack(ms), jnp.stack(bs), jnp.stack(cs)


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
