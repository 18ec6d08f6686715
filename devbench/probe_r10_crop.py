"""Crop-stage A/B: full-frame separable warp vs XLA windowed crop.

The serving pipeline's measured non-model overhead (~8.5 ms/b128, e2e
1391 vs model-only 1533 fps) is essentially the full-frame crop
contraction (1200x1920 -> 512^2, ~10 GFLOP/frame). The XLA windowed
crop (ops/warp.crop_and_resize_mxu_windowed) dynamic_slices a static
window first. This probe times JUST the crop+normalize segment at the
serving batch for window in {None, 768, 1024} and checks bit-exactness
of the windowed outputs against the full-frame path on the serving box
distribution (exactness holds when padded crop <= window-2).

Usage: python devbench/probe_r10_crop.py [batch]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.ops import pallas_crop, warp
from spacecraft_pose_estimation_tpu.pipeline import (
    boxes_to_center_scale,
    normalize_crops,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
H, W = 1200, 1920
SIZE = (512, 512)

rng = np.random.default_rng(0)
frames = jnp.asarray(rng.integers(0, 255, size=(B, H, W, 3)), jnp.uint8)
# serving default box (bench.py) + a jittered spread, both tested
boxes_fixed = jnp.asarray(
    np.tile(np.array([[700.0, 400.0, 500.0, 420.0]], np.float32), (B, 1))
)
cx = rng.uniform(500.0, 1400.0, B)
cy = rng.uniform(300.0, 900.0, B)
s = rng.uniform(250.0, 480.0, B)  # padded crop <= 720 px: exact in all windows
boxes_jit = jnp.asarray(
    np.stack([cx - s / 2, cy - s * 0.42, s, s * 0.84], axis=1), jnp.float32
)


def make(win):
    @jax.jit
    def run(frames, boxes):
        centers, scales = boxes_to_center_scale(boxes, 1.5)
        if win is None:
            crops = warp.batched_crop_and_resize(
                frames, centers, scales, jnp.zeros(B, jnp.float32), SIZE,
                method="mxu", compute_dtype=jnp.bfloat16,
            )
        else:
            scales = pallas_crop.clamp_scales_to_window(
                scales, SIZE, (win, win), coverage=(win - 2, win - 2)
            )
            crops = jax.vmap(
                lambda im, c, sc: warp.crop_and_resize_mxu_windowed(
                    im, c, sc, SIZE, win, compute_dtype=jnp.bfloat16
                )
            )(frames, centers, scales)
        return normalize_crops(crops)

    return run


def timeit(fn, *args):
    fn(*args).block_until_ready()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        fn(*args).block_until_ready()
        ts.append(time.perf_counter() - t0)
    return min(ts)


base = make(None)
ref_fixed = np.asarray(base(frames, boxes_fixed))
ref_jit = np.asarray(base(frames, boxes_jit))
t_base = timeit(base, frames, boxes_fixed)
print(f"[crop] full-frame: {t_base*1e3:.2f} ms/b{B}  "
      f"({t_base/B*1e6:.1f} us/frame)", flush=True)

for win in (768, 1024):
    fn = make(win)
    df = np.abs(np.asarray(fn(frames, boxes_fixed)) - ref_fixed).max()
    dj = np.abs(np.asarray(fn(frames, boxes_jit)) - ref_jit).max()
    t = timeit(fn, frames, boxes_fixed)
    print(f"[crop] win={win}: {t*1e3:.2f} ms/b{B}  "
          f"({t/B*1e6:.1f} us/frame)  max|d| fixed={df:.2e} jit={dj:.2e}",
          flush=True)
