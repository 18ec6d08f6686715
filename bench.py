"""End-to-end throughput benchmark: crop -> HRNet-W32 -> decode -> PnP.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the north-star target of 2000
frames/s/chip (BASELINE.md) — >1.0 beats it.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FPS = 2000.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spacecraft_pose_estimation_tpu.models.hrnet import HRNet, POSE_HRNET_W32
    from spacecraft_pose_estimation_tpu.pipeline import (
        PipelineConfig,
        make_pose_pipeline,
    )

    num_joints = 11
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    h, w = 1200, 1920  # SPEED+ frame size

    model = HRNet(config=POSE_HRNET_W32.with_joints(num_joints), dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 512, 512, 3)), train=False)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 255, size=(batch, h, w, 3)).astype(np.float32)
    )
    boxes = jnp.asarray(
        np.tile(np.array([[700.0, 400.0, 500.0, 420.0]], np.float32), (batch, 1))
    )
    lm3d = rng.normal(size=(num_joints, 3)).astype(np.float32)
    K = np.array([[2988.6, 0, 960.0], [0, 2988.3, 600.0], [0, 0, 1]], np.float32)
    dist = np.zeros(5, np.float32)

    run = make_pose_pipeline(
        model, lm3d, K, dist, PipelineConfig(solver="gn", refine_iters=5)
    )

    @jax.jit
    def step(variables, frames, boxes):
        out = run(variables, frames, boxes)
        return out["keypoints"], out["confidence"], out["R"], out["t"]

    # Warmup / compile.
    r = step(variables, frames, boxes)
    jax.block_until_ready(r)

    t0 = time.perf_counter()
    for _ in range(iters):
        r = step(variables, frames, boxes)
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0

    fps = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "e2e_crop_hrnetw32_decode_pnp_frames_per_sec",
                "value": round(fps, 2),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps / BASELINE_FPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
