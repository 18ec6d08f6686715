"""Round-3g: the even3-packed fused chain kernel on TPU.

  1. chain kernel on (128,64,64,128) packed, 4 blocks — against the
     probe_r3f baselines (direct per-op 2.815 ms, even3 per-op 4.688)
  2. full int8 model with s2d+fused_even3 — against direct 83.6 ms
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

from spacecraft_pose_estimation_tpu.ops import s2d as S
from spacecraft_pose_estimation_tpu.ops.pallas_blocks import fused_basic_block_chain


def marginal(fn, *args, reps=4, lo=2, hi=10):
    def timed(n):
        t0 = time.perf_counter()
        _ = float(fn(n, *args))
        return time.perf_counter() - t0

    timed(lo); timed(hi)
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
    print(f"{name:52s}: {t*1e3:8.3f} ms", flush=True)


B, C, H = 128, 32, 128
rng = np.random.default_rng(0)

w_std = np.asarray(rng.integers(-30, 30, (4, 2, 3, 3, C, C)), np.int8)
w_e3 = jnp.asarray(
    np.stack([np.stack([S.w3_pack_even3(w_std[k, j]) for j in range(2)])
              for k in range(4)])
)  # (4, 2, 3, 3, 128, 128)
m = np.asarray(rng.uniform(1e-4, 2e-4, (4, 2, C)), np.float32)
bv = np.asarray(rng.uniform(-0.1, 0.1, (4, 2, C)), np.float32)
m_e3 = jnp.asarray(np.tile(m, (1, 1, 4)))
b_e3 = jnp.asarray(np.tile(bv, (1, 1, 4)))
cf = jnp.asarray(rng.uniform(0.5, 0.9, (4, 2)), jnp.float32)

x_std = jnp.asarray(rng.integers(-100, 100, (B, H, H, C)), jnp.int8)
x_e3 = jnp.asarray(S.pack_even(x_std))

print("== fused even3 chain kernel ==", flush=True)


def requant(f):
    return jnp.clip(jnp.round(f), -127, 127).astype(jnp.int8)


# correctness vs the per-op even3 chain (b8)
def perop_e3(x):
    cur = x
    for k in range(4):
        y = S.conv_even3(cur, w_e3[k, 0])
        y = requant(jnp.maximum(y.astype(jnp.float32) * m_e3[k, 0] + b_e3[k, 0], 0))
        y = S.conv_even3(y, w_e3[k, 1])
        y = requant(y.astype(jnp.float32) * m_e3[k, 1] + b_e3[k, 1])
        cur = requant(jnp.maximum(
            y.astype(jnp.float32) * cf[k, 0] + cur.astype(jnp.float32) * cf[k, 1], 0))
    return cur


try:
    x8 = x_e3[:8]
    ref = np.asarray(jax.jit(perop_e3)(x8))
    got = np.asarray(fused_basic_block_chain(x8, w_e3, m_e3, b_e3, cf, 4))
    print(f"fused even3 chain: mismatches={int((ref != got).sum())}/{ref.size}", flush=True)

    def body(x, c):
        xi = (x.astype(jnp.int32) + (c * 1e-20).astype(jnp.int32)).astype(jnp.int8)
        o = fused_basic_block_chain(xi, w_e3, m_e3, b_e3, cf, 4)
        return jnp.sum(o.astype(jnp.float32)) * 1e-9

    t = marginal(scanner(body), x_e3)
    report("fused even3 chain x4 b128 (vs 2.815 direct per-op)", t)
except Exception as e:
    print(f"fused even3 chain FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

# ---- full model -------------------------------------------------------
print("== full int8 model: s2d + fused even3 chains ==", flush=True)
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

try:
    def mbody(q, x, c):
        xi = x + c * 1e-20
        hmo = hi.hrnet_int8_apply(cfg, q, xi, s2d=True, fused_even3=True,
                                  layer1_strips=False)
        return jnp.sum(hmo) * 1e-9

    t = marginal(scanner(mbody), q, x, lo=2, hi=8)
    report("int8 model even3+fused chains (vs 83.6 direct)", t)
except Exception as e:
    print(f"model fused even3 FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

print("probe_r3g done", flush=True)
