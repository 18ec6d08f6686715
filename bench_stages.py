"""Per-stage timing breakdown (dev tool, not the official bench)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from spacecraft_pose_estimation_tpu.models.hrnet import HRNet, POSE_HRNET_W32
from spacecraft_pose_estimation_tpu.ops import heatmap as hm_ops
from spacecraft_pose_estimation_tpu.ops import pnp as pnp_ops
from spacecraft_pose_estimation_tpu.ops import warp as warp_ops
from spacecraft_pose_estimation_tpu.pipeline import boxes_to_center_scale, normalize_crops


def timeit(name, fn, *args, iters=10):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:30s} {dt * 1e3:9.2f} ms/iter")
    return dt


def main():
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    num_joints = 11
    h, w = 1200, 1920
    rng = np.random.default_rng(0)

    frames = jnp.asarray(rng.integers(0, 255, size=(batch, h, w, 3)).astype(np.float32))
    boxes = jnp.asarray(np.tile(np.array([[700.0, 400.0, 500.0, 420.0]], np.float32), (batch, 1)))
    crops = jnp.asarray(rng.uniform(-2, 2, size=(batch, 512, 512, 3)).astype(np.float32))
    heatmaps = jnp.asarray(rng.uniform(0, 1, size=(batch, 128, 128, num_joints)).astype(np.float32))
    centers, scales = boxes_to_center_scale(boxes)
    lm3d = jnp.asarray(rng.normal(size=(num_joints, 3)).astype(np.float32))
    K = jnp.asarray(np.array([[2988.6, 0, 960.0], [0, 2988.3, 600.0], [0, 0, 1]], np.float32))
    dist = jnp.zeros(5)

    model = HRNet(config=POSE_HRNET_W32.with_joints(num_joints), dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 512, 512, 3)), train=False)

    warp_fn = jax.jit(
        lambda f, c, s: warp_ops.batched_crop_and_resize(f, c, s, jnp.zeros(batch), (512, 512))
    )
    model_fn = jax.jit(lambda v, x: model.apply(v, x, train=False))
    decode_fn = jax.jit(lambda hm, c, s: hm_ops.decode_heatmaps(hm, c, s))

    def pnp_all(kps, conf):
        def one(kp, cf):
            wts = pnp_ops.adaptive_confidence_mask(cf, min_count=8).astype(jnp.float32)
            return pnp_ops.solve_pnp(lm3d, kp, K, dist, wts, refine_iters=5)
        return jax.vmap(one)(kps, conf)

    pnp_fn = jax.jit(pnp_all)

    kps = jnp.asarray(rng.uniform(0, 1000, size=(batch, num_joints, 2)).astype(np.float32))
    conf = jnp.asarray(rng.uniform(0, 1, size=(batch, num_joints)).astype(np.float32))

    dt_w = timeit("warp (crop 512 from 1920)", warp_fn, frames, centers, scales)
    dt_m = timeit("hrnet_w32 512 bf16", model_fn, variables, crops)
    dt_d = timeit("decode 128x128", decode_fn, heatmaps, centers, scales)
    dt_p = timeit("pnp gn x5", pnp_fn, kps, conf)
    total = dt_w + dt_m + dt_d + dt_p
    print(f"{'sum':30s} {total * 1e3:9.2f} ms -> {batch / total:.1f} fps")


if __name__ == "__main__":
    main()
