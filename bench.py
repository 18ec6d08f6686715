"""End-to-end throughput benchmark: crop -> HRNet-W32 -> decode -> PnP.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the north-star target of 2000
frames/s/chip (BASELINE.md) — >1.0 beats it.

Timing methodology: this image's axon TPU backend is fully asynchronous
(`block_until_ready` returns before execution) and has a ~25 ms host
round-trip. We therefore run the pipeline N times inside a single
carry-chained `lax.scan` dispatch (the carry feeds each iteration so XLA
cannot hoist or dedupe the body) and report the *marginal* cost between
two N values — pure device throughput, dispatch overhead excluded.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FPS = 2000.0


def build(batch):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spacecraft_pose_estimation_tpu.models.hrnet import HRNet, POSE_HRNET_W32
    from spacecraft_pose_estimation_tpu.pipeline import (
        PipelineConfig,
        make_pose_pipeline,
    )

    num_joints = 11
    h, w = 1200, 1920  # SPEED+ frame size

    model = HRNet(config=POSE_HRNET_W32.with_joints(num_joints), dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 512, 512, 3)), train=False)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, size=(batch, h, w, 3)).astype(np.float32))
    boxes = jnp.asarray(
        np.tile(np.array([[700.0, 400.0, 500.0, 420.0]], np.float32), (batch, 1))
    )
    lm3d = rng.normal(size=(num_joints, 3)).astype(np.float32)
    K = np.array([[2988.6, 0, 960.0], [0, 2988.3, 600.0], [0, 0, 1]], np.float32)
    dist = np.zeros(5, np.float32)

    run = make_pose_pipeline(
        model, lm3d, K, dist, PipelineConfig(solver="gn", refine_iters=5)
    )

    from functools import partial

    @partial(jax.jit, static_argnames=("n",))
    def repeat(variables, frames, boxes, n):
        def body(carry, _):
            # carry-dependent perturbation forces truly serial execution.
            # Perturb the tiny boxes array, NOT the frames: materialising a
            # perturbed 3.5 GB frame tensor per iteration would add ~7 GB
            # of artificial HBM traffic per step.
            bx = boxes + carry * 1e-20
            out = run(variables, frames, bx)
            c = carry + jnp.sum(out["t"]) * 1e-20
            return c, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return c

    def timed(n):
        t0 = time.perf_counter()
        _ = float(repeat(variables, frames, boxes, n))  # readback forces exec
        return time.perf_counter() - t0

    return timed


def main():
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    n_lo = int(os.environ.get("BENCH_N_LO", "2"))
    n_hi = int(os.environ.get("BENCH_N_HI", "12"))

    timed = build(batch)
    timed(n_lo)  # compile both variants
    timed(n_hi)
    t_lo = min(timed(n_lo) for _ in range(3))
    t_hi = min(timed(n_hi) for _ in range(3))
    dt = (t_hi - t_lo) / (n_hi - n_lo)
    fps = batch / dt

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
