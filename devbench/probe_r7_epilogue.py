"""probe_r7: is the int8 residual-add chain fused into the conv epilogue?

The per-op int8 walk (models/hrnet_int8.py _Int8Ops) materializes an int8
tensor between every conv and its residual add:

  conv -> i32 -> f32*m+b -> round/clip/int8   (conv2 epilogue)
  int8 -> f32*c0 + residual*c1 -> relu -> round/clip/int8   (add)

If XLA output-fuses the add chain into the conv (the int8 intermediate
has a single consumer), the walk is already optimal and the stage3/4
28%-over-roofline gap lies elsewhere. If not, every BasicBlock pays one
extra int8 write+read of a full activation (~15 ms/b128 across the
model) and a fold-residual-into-epilogue executor variant is worth
building.

Variants (hot shape: b128 x 64^2 x 64ch, stage3 branch1):
  C: conv + requant only                      (baseline epilogue)
  A: conv + requant + int8 add(residual) walk (the serving formulation)
  B: conv + fold residual pre-round           (single epilogue, no int8
     intermediate — NOT bit-identical: skips one quantization)

Also prints XLA cost analysis bytes for A and B.
"""
import os, sys, time
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

N_LO, N_HI = 4, 16
B, H, W, C = 128, 64, 64, 64
NBLOCK = 8  # chain a few conv+add pairs so the marginal cost dominates


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
x8 = jnp.asarray(rng.integers(-127, 127, (B, H, W, C)), jnp.int8)
w8 = jnp.asarray(rng.integers(-127, 127, (3, 3, C, C)), jnp.int8)
m = jnp.asarray(rng.uniform(1e-3, 2e-3, C), jnp.float32)
bvec = jnp.asarray(rng.uniform(-0.5, 0.5, C), jnp.float32)
c0, c1 = jnp.float32(0.6), jnp.float32(0.5)


def conv(h):
    return jax.lax.conv_general_dilated(
        h, w8, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def requant(f):
    return jnp.clip(jnp.round(f), -127, 127).astype(jnp.int8)


def body_C(x8, pert):
    h = (x8.astype(jnp.int32) + jnp.int32(0)).astype(jnp.int8)
    h = jnp.where(pert > 1e30, jnp.int8(1), h)  # carry dep
    for _ in range(NBLOCK):
        h = requant(conv(h).astype(jnp.float32) * m + bvec)
    return jnp.sum(h.astype(jnp.float32)) * 1e-9


def body_A(x8, pert):
    h = jnp.where(pert > 1e30, jnp.int8(1), x8)
    for _ in range(NBLOCK):
        y8 = requant(conv(h).astype(jnp.float32) * m + bvec)  # conv2 requant
        f = y8.astype(jnp.float32) * c0 + h.astype(jnp.float32) * c1  # add
        h = requant(jnp.maximum(f, 0))
    return jnp.sum(h.astype(jnp.float32)) * 1e-9


def body_B(x8, pert):
    h = jnp.where(pert > 1e30, jnp.int8(1), x8)
    for _ in range(NBLOCK):
        f = conv(h).astype(jnp.float32) * (m * c0) + bvec * c0  # folded
        f = f + h.astype(jnp.float32) * c1
        h = requant(jnp.maximum(f, 0))
    return jnp.sum(h.astype(jnp.float32)) * 1e-9


for label, body in [("C conv-only ", body_C), ("A walk      ", body_A),
                    ("B folded    ", body_B)]:
    fn = scanner(body)
    # cost analysis of one unrolled body
    ca = jax.jit(lambda x, p: body(x, p)).lower(x8, jnp.float32(0.0)).compile()
    stats = ca.cost_analysis()
    stats = stats[0] if isinstance(stats, (list, tuple)) else stats
    by = stats.get("bytes accessed", float("nan")) if stats else float("nan")
    v = marginal(fn, x8)
    per = v * 1e3 / NBLOCK
    print(f"{label}: {v*1e3:7.3f} ms scan-iter  {per:6.4f} ms/block  "
          f"bytes={by/1e6 if by == by else -1:.1f} MB", flush=True)


# ---- whole-model A/B: per-op walk vs fold_residual at b128 ----------------
if os.environ.get("PROBE_MODEL", "1") == "1":
    from spacecraft_pose_estimation_tpu.models.hrnet import HRNet, POSE_HRNET_W32
    from spacecraft_pose_estimation_tpu.models import hrnet_int8 as hi
    from spacecraft_pose_estimation_tpu.pipeline import normalize_crops

    mrng = np.random.default_rng(0)
    model = HRNet(config=POSE_HRNET_W32.with_joints(11), dtype=jnp.bfloat16)
    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, 512, 512, 3)), train=False)
    )(jax.random.key(0))
    calib = normalize_crops(
        jnp.asarray(mrng.integers(0, 255, (4, 512, 512, 3)), jnp.float32)
    )
    q = hi.quantize_hrnet(model, variables, calib, s2d=False)
    xin = jnp.asarray(mrng.normal(size=(128, 512, 512, 3)), jnp.float32)

    for fold, fup in ((False, False), (True, False), (True, True)):
        def mbody(q, xin, pert, fold=fold, fup=fup):
            out = hi.hrnet_int8_apply(
                model.config, q, xin + pert,
                fold_residual=fold, fold_fuse_up=fup,
            )
            return jnp.sum(out) * 1e-9

        v = marginal(scanner(mbody), q, xin)
        print(f"model b128 fold_residual={fold} fold_fuse_up={fup}: "
              f"{v*1e3:8.2f} ms ({128/v:7.1f} fps model-only)", flush=True)
