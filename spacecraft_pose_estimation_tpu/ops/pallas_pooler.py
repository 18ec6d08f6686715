"""Pallas ROI pooler: per-box DMA window + MXU interpolation matmuls.

XLA lowers a vmapped `dynamic_slice` with per-box offsets to a gather —
measured at ~8 ms per (1000 boxes x 192^2x256) level on v5e, ~30x slower
than the identical compute with static slices. This kernel restores the
static-slice speed: the per-box (window, window, C) patch is DMA'd from
HBM into VMEM with the box offsets delivered via scalar prefetch, then
contracted with the precomputed bilinear+bin-average matrices (ROIAlign
is linear in the patch, see ops/roi_align.roi_align_windowed).

The interp matrices and clamped window origins are computed in plain XLA
(`window_matrices`) so the kernel body is just: copy, two matmuls, store.
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

Array = jax.Array


def window_matrices(
    boxes: Array,
    feat_h: int,
    feat_w: int,
    output_size: int,
    spatial_scale: float,
    sampling_ratio: int,
    window: int,
):
    """Per-box window origins + combined interp/average matrices.

    Returns (oy (R,), ox (R,), Wy (R, P, win), Wx (R, P, win)) with the
    same border semantics as ops/roi_align.roi_align_windowed.
    """
    p = output_size
    s = sampling_ratio
    win_h = min(window, feat_h)
    # the W offset must be 8-aligned for the tiled HBM DMA (Mosaic
    # sublane tiling); widen the window by 8 to absorb the round-down
    win_w = min(window + 8, feat_w)

    def one(box):
        x0 = box[0] * spatial_scale - 0.5
        y0 = box[1] * spatial_scale - 0.5
        x1 = box[2] * spatial_scale - 0.5
        y1 = box[3] * spatial_scale - 0.5
        grid = (jnp.arange(p)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s).reshape(-1)
        sx = x0 + grid * (x1 - x0) / p
        sy = y0 + grid * (y1 - y0) / p
        ox = jnp.clip(jnp.floor(x0).astype(jnp.int32) - 1, 0, max(feat_w - win_w, 0))
        ox = (ox // 8) * 8  # sublane-aligned DMA offset
        oy = jnp.clip(jnp.floor(y0).astype(jnp.int32) - 1, 0, max(feat_h - win_h, 0))

        def mat(coords, origin, limit, win):
            inb = (coords > -1.0) & (coords < limit)
            cc = jnp.clip(coords, 0.0, limit - 1)
            k = jax.lax.broadcasted_iota(jnp.float32, (coords.shape[0], win), 1)
            wgt = jnp.maximum(0.0, 1.0 - jnp.abs((cc[:, None] - origin) - k))
            return (wgt * inb[:, None]).reshape(p, s, win).mean(axis=1)

        return oy, ox, mat(sy, oy, feat_h, win_h), mat(sx, ox, feat_w, win_w)

    return jax.vmap(one)(boxes)


def _pooler_kernel(oy_ref, ox_ref, wy_ref, wx_ref, feat_ref, out_ref, patch, sem, *, win_h, win_w):
    r = pl.program_id(0)
    oy = oy_ref[r]
    ox = pl.multiple_of(ox_ref[r], 8)
    cp = pltpu.make_async_copy(
        feat_ref.at[pl.ds(oy, win_h), pl.ds(ox, win_w), :], patch, sem
    )
    cp.start()
    cp.wait()
    wx = wx_ref[0]  # (P, win_w)
    wy = wy_ref[0]  # (P, win_h)
    pf = patch[:].astype(jnp.float32)  # (win_h, win_w, C)
    c = pf.shape[-1]
    # out[q, p, c] = sum_h wy[q, h] * sum_w wx[p, w] * patch[h, w, c]
    pw = pf.transpose(1, 0, 2).reshape(win_w, win_h * c)
    tmp = jnp.dot(wx, pw, preferred_element_type=jnp.float32)  # (P, win_h*C)
    p_out = wx.shape[0]
    tmp = tmp.reshape(p_out, win_h, c).transpose(1, 0, 2).reshape(win_h, p_out * c)
    out = jnp.dot(wy, tmp, preferred_element_type=jnp.float32)  # (P, P*C)
    out_ref[0] = out.reshape(p_out, p_out, c)


def _ml_pooler_kernel(
    lvl_ref, oy_ref, ox_ref, wy_ref, wx_ref, f0, f1, f2, f3, out_ref, patch, sem,
    *, win_h, win_w, num_levels,
):
    r = pl.program_id(0)
    lvl = lvl_ref[r]
    oy = oy_ref[r]
    ox = pl.multiple_of(ox_ref[r], 8)
    feats = (f0, f1, f2, f3)[:num_levels]
    for li, f in enumerate(feats):
        @pl.when(lvl == li)
        def _(f=f):
            cp = pltpu.make_async_copy(
                f.at[pl.ds(oy, win_h), pl.ds(ox, win_w), :], patch, sem
            )
            cp.start()
            cp.wait()

    wx = wx_ref[0]
    wy = wy_ref[0]
    pf = patch[:].astype(jnp.float32)
    c = pf.shape[-1]
    pw = pf.transpose(1, 0, 2).reshape(win_w, win_h * c)
    tmp = jnp.dot(wx, pw, preferred_element_type=jnp.float32)
    p_out = wx.shape[0]
    tmp = tmp.reshape(p_out, win_h, c).transpose(1, 0, 2).reshape(win_h, p_out * c)
    out = jnp.dot(wy, tmp, preferred_element_type=jnp.float32)
    out_ref[0] = out.reshape(p_out, p_out, c)


@functools.partial(
    jax.jit,
    static_argnames=(
        "output_size", "strides", "sampling_ratio", "window",
        "canonical_size", "canonical_level", "interpret",
    ),
)
def multilevel_roi_align_pallas(
    feats: tuple,  # per-level (Hl, Wl, C), fine->coarse; all padded so
    # that Hl >= win_h, Wl >= win_w (callers pad tiny top levels)
    boxes: Array,  # (R, 4)
    output_size: int,
    strides: tuple,
    sampling_ratio: int = 2,
    window: int = 32,
    canonical_size: float = 224.0,
    canonical_level: int = 4,
    interpret: bool | None = None,
) -> Array:
    """FPN ROI pooling in ONE kernel pass: each box's assigned level is
    selected inside the kernel (conditional DMA), so the work is R boxes
    — not R x L as in the pool-everything XLA formulation."""
    import math

    from .roi_align import _check_window_covers

    _check_window_covers(feats, strides, canonical_size, canonical_level, window)

    num_levels = len(feats)
    assert num_levels <= 4
    c = feats[0].shape[-1]
    r = boxes.shape[0]
    p = output_size
    win_h = window
    win_w = window + 8
    lvl_min = int(math.log2(strides[0]))

    areas = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )
    target = jnp.floor(
        canonical_level + jnp.log2(jnp.sqrt(areas) / canonical_size + 1e-8)
    )
    levels = jnp.clip(target, lvl_min, lvl_min + num_levels - 1).astype(jnp.int32) - lvl_min

    # pad all levels to at least (win_h, win_w) so every DMA window fits
    padded = []
    for f in feats:
        ph = max(win_h - f.shape[0], 0)
        pw_ = max(win_w - f.shape[1], 0)
        padded.append(jnp.pad(f, ((0, ph), (0, pw_), (0, 0))))
    while len(padded) < 4:
        padded.append(padded[-1])

    # per-box origins/matrices at the assigned level's scale: window
    # clamps use the PADDED dims (where the DMA reads), zero/border
    # semantics use the TRUE dims (padding rows never get weight)
    def level_mats(f_true, f_pad, stride):
        scale = 1.0 / stride
        th, tw = f_true.shape[0], f_true.shape[1]
        ph_, pw_ = f_pad.shape[0], f_pad.shape[1]

        def one(box):
            x0 = box[0] * scale - 0.5
            y0 = box[1] * scale - 0.5
            x1 = box[2] * scale - 0.5
            y1 = box[3] * scale - 0.5
            grid = (
                jnp.arange(p)[:, None] + (jnp.arange(sampling_ratio)[None, :] + 0.5)
                / sampling_ratio
            ).reshape(-1)
            sx = x0 + grid * (x1 - x0) / p
            sy = y0 + grid * (y1 - y0) / p
            ox = jnp.clip(jnp.floor(x0).astype(jnp.int32) - 1, 0, pw_ - win_w)
            ox = (ox // 8) * 8
            oy = jnp.clip(jnp.floor(y0).astype(jnp.int32) - 1, 0, ph_ - win_h)

            def mat(coords, origin, limit, win):
                inb = (coords > -1.0) & (coords < limit)
                cc = jnp.clip(coords, 0.0, limit - 1)
                k = jax.lax.broadcasted_iota(jnp.float32, (coords.shape[0], win), 1)
                wgt = jnp.maximum(0.0, 1.0 - jnp.abs((cc[:, None] - origin) - k))
                return (wgt * inb[:, None]).reshape(p, sampling_ratio, win).mean(axis=1)

            return oy, ox, mat(sy, oy, th, win_h), mat(sx, ox, tw, win_w)

        return jax.vmap(one)(boxes)

    mats = [level_mats(f, fp, s) for f, fp, s in zip(feats, padded, strides)]

    def sel(xs):
        return jnp.take_along_axis(jnp.stack(xs), levels[None, :], axis=0)[0]

    oy = sel([m[0] for m in mats])
    ox = sel([m[1] for m in mats])
    onehot = jax.nn.one_hot(levels, num_levels, axis=0)  # (L, R)
    Wy = jnp.einsum("lr,lrpw->rpw", onehot, jnp.stack([m[2] for m in mats]))
    Wx = jnp.einsum("lr,lrpw->rpw", onehot, jnp.stack([m[3] for m in mats]))

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kernel = functools.partial(
        _ml_pooler_kernel, win_h=win_h, win_w=win_w, num_levels=num_levels
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, p, win_h), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, p, win_w), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, p, p, c), lambda i, *_: (i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((win_h, win_w, c), padded[0].dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, p, p, c), jnp.float32),
        interpret=interpret,
    )(levels, oy, ox, Wy, Wx, *padded)


@functools.partial(
    jax.jit,
    static_argnames=("output_size", "spatial_scale", "sampling_ratio", "window", "interpret"),
)
def roi_align_pallas(
    feat: Array,  # (H, W, C)
    boxes: Array,  # (R, 4)
    output_size: int,
    spatial_scale: float,
    sampling_ratio: int = 2,
    window: int = 48,
    interpret: bool | None = None,
) -> Array:
    """ROIAlign via the Pallas DMA pooler. Semantics == roi_align_windowed."""
    h, w, c = feat.shape
    r = boxes.shape[0]
    p = output_size
    win_h = min(window, h)
    win_w = min(window + 8, w)
    oy, ox, Wy, Wx = window_matrices(
        boxes, h, w, p, spatial_scale, sampling_ratio, window
    )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kernel = functools.partial(_pooler_kernel, win_h=win_h, win_w=win_w)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, p, win_h), lambda i, oy, ox: (i, 0, 0)),
            pl.BlockSpec((1, p, win_w), lambda i, oy, ox: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # feat stays off-chip
        ],
        out_specs=pl.BlockSpec((1, p, p, c), lambda i, oy, ox: (i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((win_h, win_w, c), feat.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, p, p, c), jnp.float32),
        interpret=interpret,
    )(oy, ox, Wy, Wx, feat)
