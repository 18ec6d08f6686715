"""Windowed serving crop: per-frame DMA window + windowed MXU warp.

The full-frame separable crop (ops/warp.crop_and_resize_mxu) contracts
dense (out, W) / (out, H) tap matrices against the WHOLE 1920x1200
frame: ~4.5 GMAC + a 27.6 MB frame read per image (~10 ms of the 96 ms
serving budget at b128). But the padded crop box is typically <=800 px —
the warp only ever needs a window.

This kernel DMAs each frame's (window_h, window_w) uint8 region (origin
from the box, scalar-prefetched, aligned down to the Mosaic tiling:
rows 32, cols 128 px) and widens it to the compute dtype in VMEM; the
separable interpolation then contracts window-local tap matrices (built
against the SAME rounded origins, so the rounding cancels exactly).
Semantics == crop_and_resize_mxu whenever the padded box fits the
window's guaranteed coverage; `clamp_scales_to_window` enforces that
bound by tightening oversized boxes (graceful degradation — a slightly
tighter crop, never garbage).

Frames layout: (B, H, W*3) uint8 — channels flattened into the minor
dim so lanes are wide (a (.., 3)-minor VMEM buffer would pad 3 -> 128
lanes, 42x waste).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only import guard
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

from . import geometry

Array = jax.Array

_ALIGN_Y = 32  # uint8 sublane tile
_ALIGN_X = 128  # lane tile, in PIXELS (x3 bytes = 384, a lane multiple)


def window_coverage(window: tuple[int, int]) -> tuple[int, int]:
    """Usable (h, w) coverage of a DMA window after alignment slack and
    the bilinear +1 tap."""
    wh, ww = window
    return wh - _ALIGN_Y - 1, ww - _ALIGN_X - 1


def _effective_window(h: int, w: int, window: tuple[int, int]) -> tuple[int, int]:
    """Enlarge the requested window so the origin clip bounds (h-wh,
    w-ww) are themselves alignment multiples — otherwise rounding a
    clipped origin down would pull the window off the bottom/right frame
    edge and lose coverage there."""
    wh = min(window[0], h)
    ww = min(window[1], w)
    wh += (h - wh) % _ALIGN_Y
    ww += (w - ww) % _ALIGN_X
    return wh, ww


def clamp_scales_to_window(
    scales: Array, out_size: tuple[int, int], window: tuple[int, int],
    coverage: tuple[int, int] | None = None,
) -> Array:
    """Shrink (B, 2) scales so the square src crop (side scale[...,0]*200,
    aspect dst_h/dst_w) fits the window's guaranteed coverage.

    coverage: override the usable (h, w). Default = this DMA kernel's
    alignment-slack coverage; the XLA dynamic_slice window path uses the
    full window minus a 2 px rounding+bilinear-tap margin."""
    cov_h, cov_w = coverage if coverage is not None else window_coverage(window)
    out_w, out_h = out_size
    # src extent: x = s0*200, y = s0*200*(out_h/out_w)
    smax_x = cov_w / geometry.PIXEL_STD
    smax_y = cov_h / geometry.PIXEL_STD * (out_w / max(out_h, 1))
    factor = jnp.minimum(1.0, jnp.minimum(smax_x, smax_y) / jnp.maximum(scales[:, :1], 1e-6))
    return scales * factor


def _window_kernel(oy_ref, ox3_ref, frames_ref, out_ref, patch, sem, *, hc, ww3):
    b = pl.program_id(0)
    ci = pl.program_id(1)
    oy = pl.multiple_of(oy_ref[b] + ci * hc, _ALIGN_Y)
    ox3 = pl.multiple_of(ox3_ref[b], _ALIGN_X * 3)
    cp = pltpu.make_async_copy(
        frames_ref.at[b, pl.ds(oy, hc), pl.ds(ox3, ww3)], patch, sem
    )
    cp.start()
    cp.wait()
    if out_ref.dtype == patch.dtype:
        out_ref[0] = patch[:]
    else:
        # Mosaic has no direct uint8 -> bfloat16 cast; widen via i32/f32
        out_ref[0] = patch[:].astype(jnp.int32).astype(jnp.float32).astype(out_ref.dtype)


def _hcontract_kernel(
    oy_ref, ox3_ref, wy_ref, frames_ref, out_ref, patch, sem, *, wh, w3, ww3, hc
):
    """DMA FULL-WIDTH row slabs and contract the H axis in-kernel.

    Two lessons baked in (measured on v5e):
    * a column-windowed HBM DMA is row-overhead-bound (~100 ns per
      2.7 KB strided row = ~90 us per 848-row window, 11.6 ms/b128) —
      full-width slabs are one contiguous burst (~7 us);
    * emitting the H-contracted (out, ww3) tensor instead of the raw
      window halves the writeback and puts the first warp matmul on the
      MXU, overlapped with the next image's DMA. The column windowing
      becomes a cheap VMEM slice (128-px-aligned lanes) feeding the dot.
    """
    b = pl.program_id(0)
    oy = pl.multiple_of(oy_ref[b], _ALIGN_Y)
    ox3 = pl.multiple_of(ox3_ref[b], _ALIGN_X * 3)
    wy = wy_ref[0]  # (OUT, wh)
    # static row-chunk schedule; chunk STARTS stay 32-aligned (oy is)
    chunks = [(i * hc, hc) for i in range(wh // hc)]
    if wh % hc:
        chunks.append((wh - wh % hc, wh % hc))

    def dma(slot, r0, rows):
        return pltpu.make_async_copy(
            frames_ref.at[b, pl.ds(oy + r0, rows), :],
            patch.at[slot, pl.ds(0, rows), :],
            sem.at[slot],
        )

    dma(0, *chunks[0]).start()
    # STATIC loop: dynamic_slice on VALUES has no Pallas-TPU lowering
    # (refs with pl.ds are fine) — wy row-slices must be static
    acc = jnp.zeros((wy.shape[0], ww3), jnp.float32)
    for i, (r0, rows) in enumerate(chunks):
        if i + 1 < len(chunks):
            dma((i + 1) % 2, *chunks[i + 1]).start()
        dma(i % 2, r0, rows).wait()
        win = patch[i % 2, 0:rows, pl.ds(ox3, ww3)]
        win_bf = win.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            wy[:, r0:r0 + rows], win_bf,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("window", "out_dtype", "interpret"))
def extract_windows(
    frames: Array,  # (B, H, W, 3) uint8
    oy: Array,  # (B,) int32, 32-aligned row origins
    ox: Array,  # (B,) int32, 128-aligned col origins (pixels)
    window: tuple[int, int],
    out_dtype=jnp.bfloat16,
    interpret: bool | None = None,
) -> Array:
    """DMA per-frame windows; returns (B, wh, ww*3) in ``out_dtype``."""
    b, h, w, _ = frames.shape
    wh, ww = _effective_window(h, w, window)
    ww3 = ww * 3
    frames2d = frames.reshape(b, h, w * 3)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # row chunking keeps the double-buffered out blocks inside VMEM
    hc = wh
    while hc > 256 and hc % 2 == 0:
        hc //= 2
    if hc % _ALIGN_Y:  # odd wh etc.: fall back to one whole-window chunk
        hc = wh
    n_chunks = wh // hc
    kernel = functools.partial(_window_kernel, hc=hc, ww3=ww3)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, n_chunks),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, hc, ww3), lambda i, j, oy, ox: (i, j, 0)),
        scratch_shapes=[
            pltpu.VMEM((hc, ww3), frames.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, wh, ww3), out_dtype),
        interpret=interpret,
    )(oy, ox * 3, frames2d)


@functools.partial(jax.jit, static_argnames=("window", "out_px", "interpret"))
def hcontract_windows(
    frames: Array,  # (B, H, W, 3) uint8
    oy: Array,
    ox: Array,
    Wy: Array,  # (B, out_px, wh) bf16 per-image row taps (window-local)
    window: tuple[int, int],
    out_px: int,
    interpret: bool | None = None,
) -> Array:
    """Fused DMA + H-contraction; returns (B, out_px, ww*3) bf16."""
    b, h, w, _ = frames.shape
    wh, ww = window
    ww3 = ww * 3
    frames2d = frames.reshape(b, h, w * 3)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    hc = 128 if wh >= 128 else wh
    kernel = functools.partial(_hcontract_kernel, wh=wh, w3=w * 3, ww3=ww3, hc=hc)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, out_px, wh), lambda i, oy, ox: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, out_px, ww3), lambda i, oy, ox: (i, 0, 0)),
        scratch_shapes=[
            # double-buffered full-width row-chunk slabs (contiguous DMA)
            pltpu.VMEM((2, hc, w * 3), frames.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, out_px, ww3), jnp.bfloat16),
        interpret=interpret,
    )(oy, ox * 3, Wy.astype(jnp.bfloat16), frames2d)


def _window_origins(centers, scales, h, w, window, out_aspect=1.0):
    """Aligned-down window origins covering the src crop.

    ``out_aspect`` = out_h/out_w: the source crop's x extent is
    scale[:,0]*200 but its y extent is that times the output aspect
    (crop_affine_matrix scales isotropically by out_w/(scale0*200)), so
    a 384x288-style non-square output reads a taller source region."""
    wh, ww = window
    side = scales[:, 0] * geometry.PIXEL_STD
    x0 = jnp.floor(centers[:, 0] - side * 0.5).astype(jnp.int32) - 1
    y0 = jnp.floor(centers[:, 1] - side * out_aspect * 0.5).astype(jnp.int32) - 1
    ox = jnp.clip(x0, 0, max(w - ww, 0))
    ox = (ox // _ALIGN_X) * _ALIGN_X
    oy = jnp.clip(y0, 0, max(h - wh, 0))
    oy = (oy // _ALIGN_Y) * _ALIGN_Y
    return oy, ox


def _interp_matrix_local(src_coords, origin, src_limit, win, dtype):
    """Window-local bilinear taps; border semantics vs the FULL frame
    (same math as warp._interp_matrix, shifted by the window origin)."""
    local = src_coords - origin.astype(jnp.float32)
    k = jax.lax.broadcasted_iota(jnp.float32, (src_coords.shape[0], win), 1)
    wgt = jnp.maximum(0.0, 1.0 - jnp.abs(local[:, None] - k))
    inb = (src_coords > -1.0) & (src_coords < src_limit)
    return (wgt * inb[:, None]).astype(dtype)


def crop_and_resize_window(
    frames: Array,  # (B, H, W, 3) uint8 (or any int/float in [0,255])
    centers: Array,  # (B, 2)
    scales: Array,  # (B, 2) — pre-clamped via clamp_scales_to_window
    out_size: tuple[int, int],
    window: tuple[int, int],
    compute_dtype=jnp.bfloat16,
    interpret: bool | None = None,
    mode: str = "hcontract",
) -> Array:
    """Batched axis-aligned crop+resize through per-frame DMA windows.

    Returns (B, out_h, out_w, 3) float32. Requires the (clamped) padded
    box to fit `window_coverage(window)`; callers clamp via
    :func:`clamp_scales_to_window`.

    mode='hcontract' (default): the H-axis warp contraction happens
    inside the DMA kernel (half the HBM traffic; the plain window-copy
    kernel measured DMA-serialization-bound at 8.4 ms/b128).
    mode='copy': copy-kernel + XLA einsums (reference path).
    """
    b, h, w, _ = frames.shape
    out_w, out_h = int(out_size[0]), int(out_size[1])
    wh, ww = _effective_window(h, w, window)
    if frames.dtype != jnp.uint8:
        frames = jnp.clip(frames, 0, 255).astype(jnp.uint8)
    oy, ox = _window_origins(
        centers, scales, h, w, (wh, ww), out_aspect=out_h / max(out_w, 1)
    )

    def taps(center, scale, oy_i, ox_i):
        M_inv = geometry.crop_affine_matrix(center, scale, 0.0, out_size, inv=True)
        xs = M_inv[0, 0] * jnp.arange(out_w, dtype=jnp.float32) + M_inv[0, 2]
        ys = M_inv[1, 1] * jnp.arange(out_h, dtype=jnp.float32) + M_inv[1, 2]
        Wx = _interp_matrix_local(xs, ox_i, w, ww, compute_dtype)
        Wy = _interp_matrix_local(ys, oy_i, h, wh, compute_dtype)
        return Wx, Wy

    Wx, Wy = jax.vmap(taps)(centers, scales, oy, ox)

    if mode == "hcontract" and compute_dtype == jnp.bfloat16:
        tmp = hcontract_windows(
            frames, oy, ox, Wy, (wh, ww), out_h, interpret=interpret
        )  # (B, out_h, ww3) bf16
        tmp = tmp.reshape(b, out_h, ww, 3)
        return jnp.einsum(
            "bowc,bpw->bopc", tmp, Wx, preferred_element_type=jnp.float32
        )

    wins = extract_windows(frames, oy, ox, (wh, ww), out_dtype=compute_dtype,
                           interpret=interpret)
    wins = wins.reshape(b, wh, ww, 3)
    # contract H then W (all-MXU, f32 accumulation)
    tmp = jnp.einsum("bhwc,boh->bowc", wins, Wy, preferred_element_type=jnp.float32)
    return jnp.einsum(
        "bowc,bpw->bopc", tmp.astype(compute_dtype), Wx,
        preferred_element_type=jnp.float32,
    )
