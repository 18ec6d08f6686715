"""Whole-model A/B: int8 HRNet-W32 @512^2 b128 — s2d branch0 on vs off,
plus the serving crop: full-frame mxu vs windowed DMA (b128 1920x1200)."""
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


def marginal(fn, *args, reps=4):
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


from spacecraft_pose_estimation_tpu.models.hrnet import HRNet, POSE_HRNET_W32
from spacecraft_pose_estimation_tpu.models import hrnet_int8 as hi
from spacecraft_pose_estimation_tpu.pipeline import normalize_crops

B = 128
rng = np.random.default_rng(0)
model = HRNet(config=POSE_HRNET_W32.with_joints(11), dtype=jnp.bfloat16)
variables = jax.jit(lambda k: model.init(k, jnp.zeros((1, 512, 512, 3)), train=False))(
    jax.random.key(0)
)
calib = normalize_crops(jnp.asarray(rng.integers(0, 255, (4, 512, 512, 3)), jnp.float32))
q = hi.quantize_hrnet(model, variables, calib, s2d=True)
cfg = model.config
x = jnp.asarray(rng.normal(size=(B, 512, 512, 3)), jnp.float32)

for s2d, strips in ((False, False), (True, False), (False, True), (True, True)):
    def body(q, x, c, s2d=s2d, strips=strips):
        xi = x + c * 1e-20
        hm = hi.hrnet_int8_apply(cfg, q, xi, s2d=s2d, layer1_strips=strips)
        return jnp.sum(hm) * 1e-9

    try:
        t = marginal(scanner(body), q, x)
        print(f"int8 model s2d={s2d} l1strips={strips}: {t*1e3:8.2f} ms"
              f"  ({B/t:7.1f} fps)", flush=True)
    except Exception as e:
        print(f"int8 model s2d={s2d} l1strips={strips}: FAILED "
              f"{type(e).__name__}: {str(e)[:300]}", flush=True)

# -- crop comparison --------------------------------------------------
from spacecraft_pose_estimation_tpu.ops import warp, pallas_crop, geometry

h, w = 1200, 1920
frames_u8 = jnp.asarray(rng.integers(0, 255, (B, h, w, 3)), jnp.uint8)
boxes = jnp.asarray(np.tile(np.array([[700.0, 400.0, 500.0, 420.0]], np.float32), (B, 1)))


def centers_scales(bx):
    return jax.vmap(partial(geometry.bbox_to_center_scale, padding=1.5))(bx)


def crop_full(frames, boxes, c):
    bx = boxes + c * 1e-20
    centers, scales = centers_scales(bx)
    crops = warp.batched_crop_and_resize(
        frames, centers, scales, jnp.zeros(B, jnp.float32), (512, 512),
        method="mxu", compute_dtype=jnp.bfloat16,
    )
    return jnp.sum(crops) * 1e-9


def crop_win(frames, boxes, c):
    bx = boxes + c * 1e-20
    centers, scales = centers_scales(bx)
    window = (832, 896)
    scales = pallas_crop.clamp_scales_to_window(scales, (512, 512), window)
    crops = pallas_crop.crop_and_resize_window(
        frames, centers, scales, (512, 512), window, compute_dtype=jnp.bfloat16
    )
    return jnp.sum(crops) * 1e-9


t = marginal(scanner(crop_full), frames_u8.astype(jnp.float32), boxes)
print(f"crop full-frame (f32 frames): {t*1e3:8.2f} ms", flush=True)
t = marginal(scanner(crop_full), frames_u8, boxes)
print(f"crop full-frame (u8 frames):  {t*1e3:8.2f} ms", flush=True)
t = marginal(scanner(crop_win), frames_u8, boxes)
print(f"crop windowed 832x896 (u8):   {t*1e3:8.2f} ms", flush=True)
print("done", flush=True)
