"""Round-5 perf queue: compile every pending A/B graph concurrently,
then measure serially once the chip is quiet (VERDICT r4 #4).

Covers the three bench-default deciders that rounds 3/4 queued but
never measured at model level:
  r12  merge_fuse off/on      (int8 walk, normalized crops input)
  r14  fold_normalize off/on  (normalize+walk vs folded walk, raw bf16)
  r10  crop window            (full-frame separable warp vs windowed,
                               RE-TIMED with the scan-marginal + scalar
                               readback scheme — probe_r10's
                               block_until_ready timing is meaningless
                               on the fully-async axon backend)

Compile strategy: ONE runtime-trip-count fori_loop executable per
variant (bench.py round-5 scheme), all lowered+compiled on parallel
threads through the remote compile service while the accuracy run
still owns the chip (compiles do not execute on the chip; the only
chip touches during the build are the PTQ calibration + input uploads).

Measurement is gated on /tmp/go_measure existing (touch it when the
chip is free) so the timings are clean.

Usage: python devbench/r5_perf_queue.py [batch]
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.models.hrnet import HRNet, POSE_HRNET_W32
from spacecraft_pose_estimation_tpu.models.hrnet_int8 import (
    hrnet_int8_apply,
    quantize_hrnet,
)
from spacecraft_pose_estimation_tpu.ops import pallas_crop, warp
from spacecraft_pose_estimation_tpu.pipeline import (
    boxes_to_center_scale,
    normalize_crops,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
H, W = 1200, 1920
SIZE = (512, 512)
N_LO, N_HI = 1, 6
GO_FILE = "/tmp/go_measure"
T0 = time.time()


def log(msg):
    print(f"[r5q t+{time.time()-T0:.0f}s] {msg}", flush=True)


log("building inputs (brief chip use: uploads + PTQ calibration)")
model = HRNet(config=POSE_HRNET_W32.with_joints(11), dtype=jnp.bfloat16)
variables = jax.jit(
    lambda k: model.init(k, jnp.zeros((1, 512, 512, 3)), train=False)
)(jax.random.key(0))
rng = np.random.default_rng(0)
calib = normalize_crops(
    jnp.asarray(rng.integers(0, 255, size=(4, 512, 512, 3)), jnp.float32)
)
q = quantize_hrnet(model, variables, calib, s2d=False)
x_norm = normalize_crops(
    jnp.asarray(rng.integers(0, 255, size=(B, 512, 512, 3)), jnp.float32)
)
x_raw = jnp.asarray(rng.integers(0, 255, size=(B, 512, 512, 3)), jnp.bfloat16)
frames = jnp.asarray(rng.integers(0, 255, size=(B, H, W, 3)), jnp.uint8)
boxes_fixed = jnp.asarray(
    np.tile(np.array([[700.0, 400.0, 500.0, 420.0]], np.float32), (B, 1))
)


def rep_of(body):
    """Runtime-trip-count repeat: one executable serves every n."""

    @jax.jit
    def rep(args, n):
        return jax.lax.fori_loop(
            0, n, lambda i, c: body(c, args), jnp.float32(0.0)
        )

    return rep


# ---- model-level variants (r12 / r14) ------------------------------------


def model_body(merge=False, fold_norm=False, normalize_in_loop=False):
    def body(c, args):
        qv, x = args
        xi = x + c * 1e-20
        if normalize_in_loop:
            xi = normalize_crops(xi)
        out = hrnet_int8_apply(
            model.config, qv, xi, merge_fuse=merge, fold_normalize=fold_norm
        )
        return c + jnp.sum(out[0, 0, 0]).astype(jnp.float32) * 1e-20

    return body


# ---- crop variants (r10, corrected timing) -------------------------------


def crop_body(win):
    def body(c, args):
        frames, boxes = args
        bx = boxes + c * 1e-20
        centers, scales = boxes_to_center_scale(bx, 1.5)
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
                lambda im, cc, sc: warp.crop_and_resize_mxu_windowed(
                    im, cc, sc, SIZE, win, compute_dtype=jnp.bfloat16
                )
            )(frames, centers, scales)
        out = normalize_crops(crops)
        return c + jnp.sum(out[0, 0, 0]).astype(jnp.float32) * 1e-20

    return body


VARIANTS = [
    ("r12 merge_fuse=off", model_body(), (q, x_norm)),
    ("r12 merge_fuse=on", model_body(merge=True), (q, x_norm)),
    ("r14 normalize+walk", model_body(normalize_in_loop=True), (q, x_raw)),
    ("r14 fold_normalize", model_body(fold_norm=True), (q, x_raw)),
    ("r10 crop full-frame", crop_body(None), (frames, boxes_fixed)),
    ("r10 crop win=768", crop_body(768), (frames, boxes_fixed)),
    ("r10 crop win=1024", crop_body(1024), (frames, boxes_fixed)),
]

exes = {}
errs = {}


def compile_one(name, body, args):
    try:
        t0 = time.time()
        exes[name] = rep_of(body).lower(args, jnp.asarray(0, jnp.int32)).compile()
        log(f"{name}: compiled in {time.time()-t0:.0f}s")
    except Exception as e:
        errs[name] = f"{type(e).__name__}: {e}"[:300]
        log(f"{name}: COMPILE FAILED {errs[name]}")


threads = [
    threading.Thread(target=compile_one, args=v, daemon=True) for v in VARIANTS
]
log(f"compiling {len(threads)} graphs on parallel threads")
for t in threads:
    t.start()
for t in threads:
    t.join()
log(f"all compiles done ({len(exes)} ok, {len(errs)} failed)")

log(f"waiting for {GO_FILE} (touch it when the chip is quiet)")
while not os.path.exists(GO_FILE):
    time.sleep(15)
log("GO — measuring serially")

results = {}
for name, _body, args in VARIANTS:
    if name not in exes:
        continue
    e = exes[name]

    def timed(n):
        t0 = time.perf_counter()
        float(e(args, jnp.asarray(n, jnp.int32)))
        return time.perf_counter() - t0

    timed(N_LO)
    timed(N_HI)
    t_lo = min(timed(N_LO) for _ in range(3))
    t_hi = min(timed(N_HI) for _ in range(3))
    dt = max((t_hi - t_lo) / (N_HI - N_LO), 1e-9)
    results[name] = dt
    log(f"{name}: {dt*1e3:.2f} ms/b{B}  ({B/dt:.1f} fps)")

log("summary:")
for name, dt in results.items():
    log(f"  {name:24s} {dt*1e3:8.2f} ms/b{B}  {B/dt:9.1f} fps")
