"""Events -> frames rendering (v2e EventRenderer, renderer.py:19-387).

The reference histograms ragged event lists with numba kernels
(hist2d_numba_seq, search_duration_idx, compute_area_counts). Here the
emulator's dense per-iteration polarity maps are integrated directly:

* DURATION mode: each sub-interval timestamp is binned into an exposure
  window; per-window accumulation = segment-sum of (pos - neg) maps,
  clipped to +-full_scale_count, then normalised to [0, 1] around grey
  0.5 exactly like `normalize_frame` (renderer.py:247-249).
* COUNT mode: windows close after `count` events — computed from the
  per-iteration event totals via a cumulative-count binning.
* AREA_COUNT: windows close when any KxK block accumulates `count`
  events (renderer.py:252-266) — per-iteration block sums + scan.

All fixed-shape; uint8 export happens at the host edge.
"""

from __future__ import annotations

import enum
from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


class ExposureMode(enum.Enum):
    DURATION = "duration"
    COUNT = "count"
    AREA_COUNT = "area_count"


def normalize_frame(acc: Array, full_scale_count: int) -> Array:
    return (acc + full_scale_count) / float(full_scale_count * 2)


def _flatten_iters(pos, neg, ts, iter_valid):
    """(T, I, H, W) maps -> time-ordered (T*I, ...) with validity."""
    t, i = ts.shape
    delta = (pos.astype(jnp.int32) - neg.astype(jnp.int32)).reshape(t * i, *pos.shape[2:])
    counts = (pos.astype(jnp.int32) + neg.astype(jnp.int32)).reshape(t * i, *pos.shape[2:])
    return delta, counts, ts.reshape(-1), iter_valid.reshape(-1)


@partial(jax.jit, static_argnames=("num_frames",))
def duration_acc(
    pos: Array,  # (T, I, H, W) bool
    neg: Array,
    ts: Array,  # (T, I)
    iter_valid: Array,  # (T, I)
    t_start: Array,
    exposure_s: float,
    num_frames: int,
) -> Array:
    """Raw per-window (pos - neg) accumulation, (num_frames, H, W) int32.

    Additive across stream chunks that share (t_start, exposure_s,
    num_frames): summing per-chunk accumulators then clip+normalizing is
    bit-identical to one pass over the whole stream — the basis of the
    O(chunk)-memory streaming render in tools/v2e.py."""
    delta, _, tflat, valid = _flatten_iters(pos, neg, ts, iter_valid)
    bins = jnp.floor((tflat - t_start) / exposure_s).astype(jnp.int32)
    bins = jnp.where(valid, jnp.clip(bins, 0, num_frames - 1), num_frames)  # invalid -> overflow bin
    return jax.ops.segment_sum(
        delta * valid[:, None, None], bins, num_segments=num_frames + 1
    )[:num_frames]


def finalize_duration(acc: Array, full_scale_count: int = 3) -> Array:
    """Clip + grey-normalize a (summed) duration accumulator."""
    return normalize_frame(
        jnp.clip(acc, -full_scale_count, full_scale_count), full_scale_count
    )


@partial(jax.jit, static_argnames=("num_frames", "full_scale_count"))
def render_duration(
    pos: Array,  # (T, I, H, W) bool
    neg: Array,
    ts: Array,  # (T, I)
    iter_valid: Array,  # (T, I)
    t_start: Array,
    exposure_s: float,
    num_frames: int,
    full_scale_count: int = 3,
) -> Array:
    """DURATION exposure: (num_frames, H, W) in [0, 1]."""
    return finalize_duration(
        duration_acc(pos, neg, ts, iter_valid, t_start, exposure_s, num_frames),
        full_scale_count,
    )


@partial(jax.jit, static_argnames=("num_frames", "count", "full_scale_count"))
def render_count(
    pos: Array,
    neg: Array,
    ts: Array,
    iter_valid: Array,
    count: int,
    num_frames: int,
    full_scale_count: int = 3,
) -> tuple[Array, Array]:
    """COUNT exposure: a frame closes every `count` events. Returns
    (frames (num_frames, H, W), frame_end_times (num_frames,))."""
    delta, counts, tflat, valid = _flatten_iters(pos, neg, ts, iter_valid)
    ev_per_iter = jnp.sum(counts * valid[:, None, None], axis=(1, 2))
    cum = jnp.cumsum(ev_per_iter)
    bins = jnp.clip(((cum - 1) // count).astype(jnp.int32), 0, num_frames - 1)
    bins = jnp.where(valid, bins, num_frames)
    acc = jax.ops.segment_sum(
        delta * valid[:, None, None], bins, num_segments=num_frames + 1
    )[:num_frames]
    acc = jnp.clip(acc, -full_scale_count, full_scale_count)
    # frame end time = last iteration timestamp assigned to each bin
    end_times = jax.ops.segment_max(
        jnp.where(valid, tflat, -jnp.inf), bins, num_segments=num_frames + 1
    )[:num_frames]
    return normalize_frame(acc, full_scale_count), end_times


@partial(jax.jit, static_argnames=("num_frames", "area_count", "area_dimension", "full_scale_count"))
def render_area_count(
    pos: Array,
    neg: Array,
    ts: Array,
    iter_valid: Array,
    area_count: int,
    area_dimension: int,
    num_frames: int,
    full_scale_count: int = 3,
) -> tuple[Array, Array]:
    """AREA_COUNT exposure: a frame closes when any area_dimension^2
    block reaches `area_count` events (renderer.py:252-266), evaluated at
    sub-iteration granularity."""
    delta, counts, tflat, valid = _flatten_iters(pos, neg, ts, iter_valid)
    h, w = delta.shape[1], delta.shape[2]
    ph = -h % area_dimension
    pw = -w % area_dimension
    cpad = jnp.pad(counts, ((0, 0), (0, ph), (0, pw)))
    blocks = cpad.reshape(
        counts.shape[0],
        (h + ph) // area_dimension,
        area_dimension,
        (w + pw) // area_dimension,
        area_dimension,
    ).sum(axis=(2, 4))
    blocks = blocks * valid[:, None, None]

    def body(carry, blk):
        acc_blocks, frame_idx = carry
        acc_blocks = acc_blocks + blk
        close = jnp.any(acc_blocks >= area_count)
        acc_blocks = jnp.where(close, jnp.zeros_like(acc_blocks), acc_blocks)
        out_idx = frame_idx
        frame_idx = frame_idx + close.astype(jnp.int32)
        return (acc_blocks, frame_idx), out_idx

    (_, _), bins = jax.lax.scan(
        body, (jnp.zeros_like(blocks[0]), jnp.zeros((), jnp.int32)), blocks
    )
    bins = jnp.where(valid, jnp.clip(bins, 0, num_frames - 1), num_frames)
    acc = jax.ops.segment_sum(
        delta * valid[:, None, None], bins, num_segments=num_frames + 1
    )[:num_frames]
    acc = jnp.clip(acc, -full_scale_count, full_scale_count)
    end_times = jax.ops.segment_max(
        jnp.where(valid, tflat, -jnp.inf), bins, num_segments=num_frames + 1
    )[:num_frames]
    return normalize_frame(acc, full_scale_count), end_times


def render_frames(mode: ExposureMode, **kwargs):
    if mode == ExposureMode.DURATION:
        return render_duration(**kwargs)
    if mode == ExposureMode.COUNT:
        return render_count(**kwargs)
    return render_area_count(**kwargs)
