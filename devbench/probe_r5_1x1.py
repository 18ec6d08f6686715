"""1x1-conv-as-dot probe: the int8 walk's 1x1 sites measure 29-38 TOP/s
through lax.conv (probe_r3), far under both the MXU shape ceiling and
HBM. Hypothesis: XLA's TPU conv path tiles spatial 1x1 convs poorly;
an explicit reshape -> dot_general -> reshape should run at the matmul
rate. Also A/Bs the crop contraction order (H-first writes a 755 MB
intermediate; W-first writes 472 MB).
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import jax
import jax.numpy as jnp
import numpy as np

N_LO, N_HI = 2, 8


def marginal(fn, *args, reps=3):
    def timed(n):
        t0 = time.perf_counter()
        _ = float(fn(n, *args))
        return time.perf_counter() - t0

    timed(N_LO)
    timed(N_HI)
    t_lo = min(timed(N_LO) for _ in range(reps))
    t_hi = min(timed(N_HI) for _ in range(reps))
    return (t_hi - t_lo) / (N_HI - N_LO)


def scanner(body):
    @partial(jax.jit, static_argnames="n")
    def fn(n, *args):
        def step(c, _):
            return c + body(*args, c) * 1e-20, None

        c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
        return c

    return fn


def report(name, secs, flops=None):
    rate = f"  {flops / secs * 1e-12:8.1f} TOP/s" if flops else ""
    print(f"{name:52s}: {secs * 1e3:8.3f} ms{rate}", flush=True)


rng = np.random.default_rng(0)


def perturb(x, c):
    return (x + jnp.asarray(c * 1e-20, x.dtype)).astype(x.dtype)


# -------- 1x1 conv vs dot (int8, with the f32 requant epilogue) --------
def probe_1x1(b, hw, cin, cout):
    x = jnp.asarray(rng.integers(-127, 128, (b, hw, hw, cin)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (1, 1, cin, cout)), jnp.int8)
    m = jnp.asarray(rng.uniform(0.5, 2.0, cout), jnp.float32)
    bias = jnp.asarray(rng.uniform(-1, 1, cout), jnp.float32)

    def epilogue(y):
        f = jnp.maximum(y.astype(jnp.float32) * m + bias, 0)
        return jnp.clip(jnp.round(f), -127, 127).astype(jnp.int8)

    def conv_body(x, w, c):
        y = jax.lax.conv_general_dilated(
            perturb(x, c), w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        return jnp.sum(epilogue(y).astype(jnp.float32))

    def dot_body(x, w, c):
        xx = perturb(x, c).reshape(-1, cin)
        y = jax.lax.dot_general(
            xx, w[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return jnp.sum(epilogue(y).astype(jnp.float32))

    flops = 2.0 * b * hw * hw * cin * cout
    report(f"1x1 {cin}->{cout} @{hw}^2 b{b} conv", marginal(scanner(conv_body), x, w), flops)
    report(f"1x1 {cin}->{cout} @{hw}^2 b{b} dot ", marginal(scanner(dot_body), x, w), flops)


print("== 1x1 conv vs dot ==", flush=True)
probe_1x1(128, 128, 256, 64)   # layer1 conv1
probe_1x1(128, 128, 64, 256)   # layer1 conv3 / down
probe_1x1(128, 64, 64, 32)     # fuse up0_1 (std layout)
probe_1x1(128, 32, 128, 32)    # fuse up0_2
probe_1x1(128, 128, 32, 64)    # transition/down entries


# -------- 3x3 conv vs dy-stacked dot (layer1 conv2 shape) --------
def probe_3x3_dot(b, hw, cin, cout):
    x = jnp.asarray(rng.integers(-127, 128, (b, hw, hw, cin)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (3, 3, cin, cout)), jnp.int8)

    def conv_body(x, w, c):
        y = jax.lax.conv_general_dilated(
            perturb(x, c), w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        return jnp.sum(y.astype(jnp.float32))

    flops = 2.0 * b * hw * hw * cin * cout * 9
    report(f"3x3 {cin}->{cout} @{hw}^2 b{b} conv", marginal(scanner(conv_body), x, w), flops)


print("== 3x3 reference ==", flush=True)
probe_3x3_dot(128, 128, 64, 64)


# -------- crop: bf16 current vs direct-u8 first contraction --------
from spacecraft_pose_estimation_tpu.ops.warp import (  # noqa: E402
    batched_crop_and_resize,
)

B, H, W = 128, 1200, 1920
frames = jnp.asarray(rng.integers(0, 255, (B, H, W, 3)), jnp.uint8)
centers = jnp.asarray(np.tile(np.array([[950.0, 610.0]], np.float32), (B, 1)))
scales = jnp.asarray(np.full((B,), 3.75, np.float32))
rots = jnp.zeros((B,), jnp.float32)


def crop_body(frames, centers, scales, c):
    out = batched_crop_and_resize(
        frames, centers + c * 1e-20, scales, rots, (512, 512),
        method="mxu", compute_dtype=jnp.bfloat16,
    )
    return jnp.sum(out.astype(jnp.float32)[:, ::64, ::64])


report("crop current bf16 taps u8 frames",
       marginal(scanner(crop_body), frames, centers, scales))


def _interp_matrix_np(src, size):
    # same math as ops/warp._interp_matrix, host-side for the probe
    x0 = np.floor(src)
    fx = src - x0
    m = np.zeros((src.shape[0], size), np.float32)
    for i, (lo, f) in enumerate(zip(x0.astype(int), fx)):
        if 0 <= lo < size:
            m[i, lo] += 1 - f
        if 0 <= lo + 1 < size:
            m[i, lo + 1] += f
    return m


def crop_u8_direct(frames, c):
    """First contraction straight from u8 (i16 view) x bf16 taps — no
    materialized bf16 frame copy; second contraction bf16."""
    # static taps for the fixed probe box
    a = 500.0 * 1.5 * 200.0 / 512.0 / 200.0  # scale*200/out, pixel_std fold
    xs = np.float32(950.0 - 250.0 * 1.5) + np.arange(512, dtype=np.float32) * np.float32(a)
    ys = np.float32(610.0 - 315.0) + np.arange(512, dtype=np.float32) * np.float32(630.0 / 512.0)
    Wx = jnp.asarray(_interp_matrix_np(xs, W))  # (512, W)
    Wy = jnp.asarray(_interp_matrix_np(ys, H))  # (512, H)
    fr = (frames + jnp.asarray(c * 1e-20, frames.dtype)).astype(frames.dtype)
    tmp = jnp.einsum(
        "bhwc,ow->bhoc", fr.astype(jnp.int16),
        jnp.clip(jnp.round(Wx * 127), -127, 127).astype(jnp.int8),
        preferred_element_type=jnp.int32,
    )
    tmp = (tmp.astype(jnp.float32) / 127.0).astype(jnp.bfloat16)
    out = jnp.einsum(
        "bhoc,ph->bpoc", tmp, Wy.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return jnp.sum(out[:, ::64, ::64])


try:
    report("crop u8-direct i16xi8 first pass",
           marginal(scanner(crop_u8_direct), frames))
except Exception as e:
    print(f"crop u8-direct FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)

print("probe_r5_1x1 done", flush=True)
