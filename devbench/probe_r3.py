"""Round-3 probe: candidate conv formulations for the HRNet int8 wall.

The 32-channel 128^2 branch convs sit exactly at the N=32/128 MXU
output-lane ceiling (189.7 TOP/s, DEVNOTES round 2). Candidate fix:
space-to-depth packing — branch0 activations live as (B, 65~64, 65~64,
128) with 2x2 pixel cells packed into channels; each 3x3/32ch conv
becomes a 2x2/128ch conv (1.83x the MACs at 4x the lane utilization,
expected ~2x net). This probe measures the raw conv rates to validate
before the integration work.

Also times the current pipeline pieces (crop / hrnet / decode+pnp) to
budget the crop-stage rework.
"""
import os, sys, time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
import jax, jax.numpy as jnp, numpy as np

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


rng = np.random.default_rng(0)
B = 128


def conv_probe(name, hw_in, cin, cout, k, pad, stride=1, dtype="int8", hw_note=None):
    """Times conv + requant epilogue (the serving per-op pattern)."""
    x8 = jnp.asarray(rng.integers(-127, 127, (B, hw_in, hw_in, cin)), jnp.int8)
    if dtype == "bf16":
        x8 = x8.astype(jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(k, k, cin, cout)) * 0.05, jnp.bfloat16)
    else:
        w = jnp.asarray(rng.integers(-127, 127, (k, k, cin, cout)), jnp.int8)
    m = jnp.asarray(rng.uniform(0.001, 0.01, (cout,)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)

    def body(x, w, m, b, c):
        xi = (x.astype(jnp.float32) + c * 1e-20).astype(x.dtype)
        kw = dict(dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if dtype == "int8":
            kw["preferred_element_type"] = jnp.int32
        y = jax.lax.conv_general_dilated(xi, w, (stride, stride), pad, **kw)
        f = jnp.maximum(y.astype(jnp.float32) * m + b, 0)
        q = jnp.clip(jnp.round(f), -127, 127).astype(jnp.int8)
        return jnp.sum(q.astype(jnp.float32))

    t = marginal(scanner(body), x8, w, m, b)
    hw_out = (hw_in + sum(pad[0]) - k) // stride + 1
    macs = B * hw_out * hw_out * k * k * cin * cout
    rate = 2 * macs / t / 1e12
    print(
        f"{name:44s}: {t*1e3:7.3f} ms  {rate:7.1f} T{'OP' if dtype=='int8' else 'FLOP'}/s"
        f"  (out {hw_out}^2x{cout})",
        flush=True,
    )
    return t


print(f"devices: {jax.devices()}", flush=True)

# -- branch0 candidates (the N=32 wall) ------------------------------
conv_probe("b0 direct 3x3 32->32 @128^2 int8", 128, 32, 32, 3, [(1, 1), (1, 1)])
conv_probe("b0 direct 3x3 32->32 @128^2 bf16", 128, 32, 32, 3, [(1, 1), (1, 1)], dtype="bf16")
# s2d conv B: even(64) -> odd(65): k=2, pad (1,1)
conv_probe("b0 s2d   2x2 128->128 @64->65 int8", 64, 128, 128, 2, [(1, 1), (1, 1)])
# s2d conv A: odd(65) -> even(64): k=2 VALID
conv_probe("b0 s2d   2x2 128->128 @65->64 int8", 65, 128, 128, 2, [(0, 0), (0, 0)])
# full-s2d 3x3 (4x FLOPs) for comparison
conv_probe("b0 s2d   3x3 128->128 @64^2 int8", 64, 128, 128, 3, [(1, 1), (1, 1)])

# -- branch1 candidates ----------------------------------------------
conv_probe("b1 direct 3x3 64->64 @64^2 int8", 64, 64, 64, 3, [(1, 1), (1, 1)])
conv_probe("b1 s2d   2x2 256->256 @32->33 int8", 32, 256, 256, 2, [(1, 1), (1, 1)])
conv_probe("b1 s2d   2x2 256->256 @33->32 int8", 33, 256, 256, 2, [(0, 0), (0, 0)])

# -- branch2/3 baselines ---------------------------------------------
conv_probe("b2 direct 3x3 128->128 @32^2 int8", 32, 128, 128, 3, [(1, 1), (1, 1)])
conv_probe("b3 direct 3x3 256->256 @16^2 int8", 16, 256, 256, 3, [(1, 1), (1, 1)])

# -- packed fuse/transition ops --------------------------------------
conv_probe("fuse 1x1 128->128 @64^2 int8 (packed up0_1)", 64, 128, 128, 1, [(0, 0), (0, 0)])
conv_probe("down 2x2 128->64 @64^2 int8 (packed down)", 64, 128, 64, 2, [(1, 0), (1, 0)])

# -- layer1 pieces (HBM-bound; strip-kernel target) ------------------
conv_probe("l1 1x1 256->64 @128^2 int8", 128, 256, 64, 1, [(0, 0), (0, 0)])
conv_probe("l1 3x3 64->64 @128^2 int8", 128, 64, 64, 3, [(1, 1), (1, 1)])
conv_probe("l1 1x1 64->256 @128^2 int8", 128, 64, 256, 1, [(0, 0), (0, 0)])

# -- elementwise: the fuse-add + requant node at 128^2x32 -------------
def add_probe():
    a = jnp.asarray(rng.integers(-127, 127, (B, 128, 128, 32)), jnp.int8)
    bb = jnp.asarray(rng.integers(-127, 127, (B, 128, 128, 32)), jnp.int8)

    def body(a, bb, c):
        f = a.astype(jnp.float32) * (0.01 + c * 1e-20) + bb.astype(jnp.float32) * 0.02
        q = jnp.clip(jnp.round(jnp.maximum(f, 0)), -127, 127).astype(jnp.int8)
        return jnp.sum(q.astype(jnp.float32))

    t = marginal(scanner(body), a, bb)
    gb = B * 128 * 128 * 32 * 3 / 1e9
    print(f"{'add+requant @128^2x32 int8':44s}: {t*1e3:7.3f} ms  {gb/t:7.1f} GB/s", flush=True)


add_probe()

# -- pipeline stage split (current serving path) ----------------------
from spacecraft_pose_estimation_tpu.ops import warp, heatmap, pnp, geometry

h, w = 1200, 1920
frames_f32 = jnp.asarray(rng.integers(0, 255, (B, h, w, 3)).astype(np.float32))
frames_u8 = frames_f32.astype(jnp.uint8)
boxes = jnp.asarray(np.tile(np.array([[700.0, 400.0, 500.0, 420.0]], np.float32), (B, 1)))


def crop_body(frames, boxes, c):
    bx = boxes + c * 1e-20
    centers, scales = jax.vmap(partial(geometry.bbox_to_center_scale, padding=1.5))(bx)
    crops = warp.batched_crop_and_resize(
        frames, centers, scales, jnp.zeros(B, jnp.float32), (512, 512),
        method="mxu", compute_dtype=jnp.bfloat16,
    )
    return jnp.sum(crops)


t = marginal(scanner(crop_body), frames_f32, boxes)
print(f"{'crop mxu bf16 from f32 frames b128':44s}: {t*1e3:7.3f} ms", flush=True)
t = marginal(scanner(crop_body), frames_u8, boxes)
print(f"{'crop mxu bf16 from u8 frames b128':44s}: {t*1e3:7.3f} ms", flush=True)


# decode + pnp
def dp_body(hm, centers, scales, lm3d, K, dist, c):
    hm = hm + c * 1e-20
    preds, maxvals = heatmap.decode_heatmaps(hm, centers, scales, post_process=True)

    def solve(kps, conf):
        wgt = pnp.adaptive_confidence_mask(conf, min_count=11)
        return pnp.solve_pnp(lm3d, kps, K, dist, wgt.astype(jnp.float32), refine_iters=5)

    R, tt = jax.vmap(solve)(preds, maxvals)
    return jnp.sum(tt)


hm = jnp.asarray(rng.normal(size=(B, 128, 128, 11)), jnp.float32)
centers = jnp.tile(jnp.asarray([[950.0, 610.0]], jnp.float32), (B, 1))
scales = jnp.tile(jnp.asarray([[3.75, 3.15]], jnp.float32), (B, 1))
lm3d = jnp.asarray(rng.normal(size=(11, 3)), jnp.float32)
K = jnp.asarray([[2988.6, 0, 960.0], [0, 2988.3, 600.0], [0, 0, 1]], jnp.float32)
dist = jnp.zeros(5, jnp.float32)
t = marginal(scanner(dp_body), hm, centers, scales, lm3d, K, dist)
print(f"{'decode+pnp(gn5) b128':44s}: {t*1e3:7.3f} ms", flush=True)
print("probe done", flush=True)
