"""Per-stage timing breakdown with scan-marginal methodology (dev tool).

Each stage is looped N times inside one dispatch with a carry-dependent
perturbation; cost = (t(N_hi) - t(N_lo)) / (N_hi - N_lo).
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from spacecraft_pose_estimation_tpu.models.hrnet import HRNet, POSE_HRNET_W32
from spacecraft_pose_estimation_tpu.ops import heatmap as hm_ops
from spacecraft_pose_estimation_tpu.ops import pnp as pnp_ops
from spacecraft_pose_estimation_tpu.ops import warp as warp_ops
from spacecraft_pose_estimation_tpu.pipeline import boxes_to_center_scale

N_LO, N_HI = 2, 10


def marginal_time(fn, *args):
    """fn(x, n) loops n times internally; returns marginal seconds/iter."""

    def timed(n):
        t0 = time.perf_counter()
        _ = float(fn(n, *args))
        return time.perf_counter() - t0

    timed(N_LO)
    timed(N_HI)
    t_lo = min(timed(N_LO) for _ in range(3))
    t_hi = min(timed(N_HI) for _ in range(3))
    return (t_hi - t_lo) / (N_HI - N_LO)


def scanner(body):
    """Wrap body(*args, pert) -> scalar into an n-iteration scan fn."""

    @partial(jax.jit, static_argnames="n")
    def fn(n, *args):
        def step(c, _):
            out = body(*args, c)
            return c + out * 1e-20, None

        c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
        return c

    return fn


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
    kps = jnp.asarray(rng.uniform(0, 1000, size=(batch, num_joints, 2)).astype(np.float32))
    conf = jnp.asarray(rng.uniform(0, 1, size=(batch, num_joints)).astype(np.float32))

    model = HRNet(config=POSE_HRNET_W32.with_joints(num_joints), dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 512, 512, 3)), train=False)

    # perturb centers (tiny), not frames: a perturbed frame tensor would
    # add GBs of artificial HBM traffic per iteration
    warp_fn = scanner(
        lambda f, c, s, pert: jnp.sum(
            warp_ops.batched_crop_and_resize(
                f, c + pert, s, jnp.zeros(f.shape[0]), (512, 512), method="gather"
            )
        )
    )
    warp_mxu_fn = scanner(
        lambda f, c, s, pert: jnp.sum(
            warp_ops.batched_crop_and_resize(
                f, c + pert, s, jnp.zeros(f.shape[0]), (512, 512),
                method="mxu", compute_dtype=jnp.bfloat16,
            )
        )
    )
    model_fn = scanner(lambda v, x, pert: jnp.sum(model.apply(v, x + pert, train=False)))
    decode_fn = scanner(
        lambda hm, c, s, pert: jnp.sum(hm_ops.decode_heatmaps(hm + pert, c, s)[0])
    )

    def pnp_body(kp, cf, pert):
        def one(kp1, cf1):
            wts = pnp_ops.adaptive_confidence_mask(cf1, min_count=8).astype(jnp.float32)
            R, t = pnp_ops.solve_pnp(lm3d, kp1, K, dist, wts, refine_iters=5)
            return jnp.sum(t)

        return jnp.sum(jax.vmap(one)(kp + pert, cf))

    pnp_fn = scanner(pnp_body)

    def epnp_only_body(kp, cf, pert):
        def one(kp1, cf1):
            wts = (cf1 > 0.5).astype(jnp.float32)
            R, t = pnp_ops.epnp(lm3d, kp1 / 1000.0, wts)
            return jnp.sum(t)

        return jnp.sum(jax.vmap(one)(kp + pert, cf))

    epnp_fn = scanner(epnp_only_body)

    stages = [
        ("decode", decode_fn, (heatmaps, centers, scales)),
        ("epnp_only", epnp_fn, (kps, conf)),
        ("pnp_gn5", pnp_fn, (kps, conf)),
        ("hrnet_w32_512_bf16", model_fn, (variables, crops)),
        ("warp_gather", warp_fn, (frames, centers, scales)),
        ("warp_mxu_bf16", warp_mxu_fn, (frames, centers, scales)),
    ]
    for name, fn, args in stages:
        v = marginal_time(fn, *args)
        print(f"{name:24s} {v * 1e3:9.2f} ms/batch   {batch / v:10.1f} fps", flush=True)

    bench_loader(batch)


def bench_loader(batch):
    """Host input-pipeline throughput (VERDICT r1 #7): the loader must
    feed >= 2x the device frames/s so the chip never starves. Measures
    full-size JPEG decode via the thread-pool loader vs serial."""
    import tempfile

    import cv2

    from spacecraft_pose_estimation_tpu.data.loader import (
        default_num_workers,
        parallel_batches,
    )

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as d:
        paths = []
        for i in range(16):
            img = rng.integers(0, 255, (1200, 1920, 3), np.uint8)
            p = os.path.join(d, f"{i}.jpg")
            cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 90])
            paths.append(p)

        def make(i):
            return cv2.imread(paths[i % len(paths)], cv2.IMREAD_COLOR)

        def stream(nb):
            for b in range(nb):
                yield b, [(b * batch + j) for j in range(batch)]

        def run(workers, nb):
            t0 = time.perf_counter()
            n = 0
            for out in parallel_batches(
                stream(nb), make, lambda m, exs: len(exs), num_workers=workers
            ):
                n += out
            return n / (time.perf_counter() - t0)

        run(0, 1)  # warm the page cache
        serial = run(0, 4)
        par = run(default_num_workers(), 8)
        print(
            f"{'loader_serial':24s} {'':9s}            {serial:10.1f} fps", flush=True
        )
        print(
            f"{'loader_parallel(x' + str(default_num_workers()) + ')':24s} "
            f"{'':9s}            {par:10.1f} fps",
            flush=True,
        )


if __name__ == "__main__":
    main()
