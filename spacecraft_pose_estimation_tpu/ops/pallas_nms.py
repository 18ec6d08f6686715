"""Greedy NMS as a single Pallas TPU kernel.

The XLA formulation (ops/nms.py) materialises an N x N IoU matrix in HBM
and runs an N-step `fori_loop` over it. This kernel keeps the whole
working set (4 coordinate rows + the suppression state) in VMEM and
computes each suppression row on the fly on the VPU — one kernel launch,
no HBM traffic beyond the inputs/outputs.

Boxes must be pre-sorted by descending score (ops/nms.py handles
ordering and un-ordering); N should be a multiple of 128 for lane
alignment (callers pad with valid=False entries).

On non-TPU backends the kernel runs in interpreter mode, so tests cover
it on the CPU mesh.
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


def _nms_kernel(boxes_ref, valid_ref, out_ref, *, iou_threshold: float):
    # boxes_ref: (4, N) rows x0, y0, x1, y1 ; valid_ref/out_ref: (1, N)
    x0 = boxes_ref[0:1, :]
    y0 = boxes_ref[1:2, :]
    x1 = boxes_ref[2:3, :]
    y1 = boxes_ref[3:4, :]
    valid = valid_ref[0:1, :]
    n = x0.shape[1]
    area = jnp.maximum(x1 - x0, 0.0) * jnp.maximum(y1 - y0, 0.0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def body(i, suppressed):
        xi0 = jax.lax.dynamic_slice(x0, (0, i), (1, 1))
        yi0 = jax.lax.dynamic_slice(y0, (0, i), (1, 1))
        xi1 = jax.lax.dynamic_slice(x1, (0, i), (1, 1))
        yi1 = jax.lax.dynamic_slice(y1, (0, i), (1, 1))
        ai = jnp.maximum(xi1 - xi0, 0.0) * jnp.maximum(yi1 - yi0, 0.0)
        iw = jnp.maximum(jnp.minimum(x1, xi1) - jnp.maximum(x0, xi0), 0.0)
        ih = jnp.maximum(jnp.minimum(y1, yi1) - jnp.maximum(y0, yi0), 0.0)
        inter = iw * ih
        union = area + ai - inter
        iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)

        vi = jax.lax.dynamic_slice(valid, (0, i), (1, 1))
        si = jax.lax.dynamic_slice(suppressed, (0, i), (1, 1))
        keep_i = (vi > 0.5) & (si < 0.5)
        new_sup = (iou > iou_threshold) & keep_i & (col != i)
        return jnp.maximum(suppressed, new_sup.astype(jnp.float32))

    suppressed = jax.lax.fori_loop(0, n, body, jnp.zeros((1, n), jnp.float32))
    out_ref[0:1, :] = ((valid > 0.5) & (suppressed < 0.5)).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def nms_mask_sorted_pallas(
    boxes_sorted: Array,  # (N, 4) descending-score order
    valid_sorted: Array,  # (N,)
    iou_threshold: float,
    interpret: bool = False,
) -> Array:
    """Keep-mask (in sorted order) via the Pallas kernel."""
    n = boxes_sorted.shape[0]
    rows = boxes_sorted.T.astype(jnp.float32)  # (4, N)
    valid = valid_sorted.astype(jnp.float32)[None, :]
    on_tpu = jax.default_backend() == "tpu"
    kernel = functools.partial(_nms_kernel, iou_threshold=iou_threshold)
    kwargs = {}
    if on_tpu and pltpu is not None and not interpret:
        kwargs["in_specs"] = [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        kwargs["out_specs"] = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        interpret=not on_tpu or interpret,
        **kwargs,
    )(rows, valid)
    return out[0] > 0.5


def nms_mask_pallas(
    boxes: Array, scores: Array, iou_threshold: float, valid: Array | None = None
) -> Array:
    """Drop-in for ops.nms.nms_mask using the Pallas kernel."""
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones(n, bool)
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    order = jnp.argsort(jnp.where(valid, scores, neg_inf), descending=True)
    keep_sorted = nms_mask_sorted_pallas(boxes[order], valid[order], iou_threshold)
    return jnp.zeros(n, bool).at[order].set(keep_sorted)
