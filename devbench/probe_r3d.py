"""Round-3d: decompose the 999-fps regression (probe_r3c) and time the
shallow-linalg PnP. Order: cheap graphs first.

  1. decode+pnp with the fixed-depth linalg (was 4.05 ms for gn5)
  2. full-frame separable crop: int8 taps vs bf16 taps (u8 frames)
  3. int8 model 512^2 b128: direct walk vs even3 s2d walk
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


def marginal(fn, *args, reps=4, lo=2, hi=10):
    def timed(n):
        t0 = time.perf_counter()
        _ = float(fn(n, *args))
        return time.perf_counter() - t0

    timed(lo)
    timed(hi)
    t_lo = min(timed(lo) for _ in range(reps))
    t_hi = min(timed(hi) for _ in range(reps))
    return (t_hi - t_lo) / (hi - lo)


def scanner(body):
    @partial(jax.jit, static_argnames="n")
    def fn(n, *args):
        def step(c, _):
            return c + body(*args, c) * 1e-20, None

        c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
        return c

    return fn


def report(name, t):
    print(f"{name:50s}: {t*1e3:8.3f} ms", flush=True)


B = 128
rng = np.random.default_rng(0)

# ---- 1. decode + pnp --------------------------------------------------
print("== decode/pnp (shallow linalg) ==", flush=True)
from spacecraft_pose_estimation_tpu.ops import heatmap, pnp

hm = jnp.asarray(rng.normal(size=(B, 128, 128, 11)), jnp.float32)
centers = jnp.tile(jnp.asarray([[950.0, 610.0]], jnp.float32), (B, 1))
scales = jnp.tile(jnp.asarray([[3.75, 3.15]], jnp.float32), (B, 1))
lm3d = jnp.asarray(rng.normal(size=(11, 3)), jnp.float32)
K = jnp.asarray([[2988.6, 0, 960.0], [0, 2988.3, 600.0], [0, 0, 1]], jnp.float32)
dist = jnp.zeros(5, jnp.float32)
kps = jnp.asarray(rng.uniform(0, 1900, (B, 11, 2)), jnp.float32)
conf = jnp.asarray(rng.uniform(0.5, 1.0, (B, 11)), jnp.float32)


def pnp_body(kps, conf, c):
    k2 = kps + c * 1e-20

    def solve(kp, cf):
        wt = pnp.adaptive_confidence_mask(cf, min_count=11)
        return pnp.solve_pnp(lm3d, kp, K, dist, wt.astype(jnp.float32), refine_iters=5)

    R, tt = jax.vmap(solve)(k2, conf)
    return jnp.sum(tt) * 1e-9


t = marginal(scanner(pnp_body), kps, conf)
report("pnp gn5 shallow-linalg", t)


def dec_body(hm, c):
    hmi = hm + c * 1e-20
    preds, maxvals = heatmap.decode_heatmaps(hmi, centers, scales, post_process=True)
    return jnp.sum(preds) * 1e-9


t = marginal(scanner(dec_body), hm)
report("decode post_process=True", t)

# ---- 2. crop: int8 vs bf16 taps --------------------------------------
print("== crop ==", flush=True)
from spacecraft_pose_estimation_tpu.ops import geometry, warp

h, w = 1200, 1920
frames_u8 = jnp.asarray(rng.integers(0, 255, (B, h, w, 3)), jnp.uint8)
boxes = jnp.asarray(np.tile(np.array([[700.0, 400.0, 500.0, 420.0]], np.float32), (B, 1)))


def cs(bx):
    return jax.vmap(partial(geometry.bbox_to_center_scale, padding=1.5))(bx)


for dt_name, dt in (("int8", jnp.int8), ("bf16", jnp.bfloat16)):

    def crop_body(frames, boxes, c, dt=dt):
        bx = boxes + c * 1e-20
        centers, scales = cs(bx)
        crops = warp.batched_crop_and_resize(
            frames, centers, scales, jnp.zeros(B, jnp.float32), (512, 512),
            method="mxu", compute_dtype=dt,
        )
        return jnp.sum(crops.astype(jnp.float32)[:, ::31, ::37]) * 1e-9

    try:
        t = marginal(scanner(crop_body), frames_u8, boxes)
        report(f"crop mxu {dt_name} taps u8 frames b128", t)
    except Exception as e:
        print(f"crop {dt_name} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

# ---- 3. int8 model: direct vs even3 ----------------------------------
print("== int8 model ==", flush=True)
from spacecraft_pose_estimation_tpu.models.hrnet import HRNet, POSE_HRNET_W32
from spacecraft_pose_estimation_tpu.models import hrnet_int8 as hi
from spacecraft_pose_estimation_tpu.pipeline import normalize_crops

model = HRNet(config=POSE_HRNET_W32.with_joints(11), dtype=jnp.bfloat16)
variables = jax.jit(lambda k: model.init(k, jnp.zeros((1, 512, 512, 3)), train=False))(
    jax.random.key(0)
)
calib = normalize_crops(jnp.asarray(rng.integers(0, 255, (4, 512, 512, 3)), jnp.float32))
q = hi.quantize_hrnet(model, variables, calib, s2d=True)
cfg = model.config
x = jnp.asarray(rng.normal(size=(B, 512, 512, 3)), jnp.float32)

for label, s2d in (("direct", False), ("even3 s2d", True)):

    def body(q, x, c, s2d=s2d):
        xi = x + c * 1e-20
        hmo = hi.hrnet_int8_apply(cfg, q, xi, s2d=s2d, layer1_strips=False)
        return jnp.sum(hmo) * 1e-9

    try:
        t = marginal(scanner(body), q, x, lo=2, hi=8)
        report(f"int8 model {label}", t)
    except Exception as e:
        print(f"int8 model {label} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

print("probe_r3d done", flush=True)
