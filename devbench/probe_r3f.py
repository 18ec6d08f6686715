"""Round-3f: localize the even3-s2d in-situ regression (probe_r3d:
model 111 ms even3 vs 83.6 direct, while isolated convs measured 25%
FASTER). Segments, each timed in both schemes with the real requant
epilogues at b128:

  S0  single 3x3 conv + requant        (anchor: reproduces probe_r3)
  S1  4-block BasicBlock chain (8 convs + 4 adds)
  S2  fuse-exchange into branch0 (3 up 1x1s at coarse res + upsample
      + 4-way weighted add + relu)
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


def rw(*shape, hi=30):
    return np.asarray(rng.integers(-hi, hi, shape), np.int8)


def requant(f):
    return jnp.clip(jnp.round(f), -127, 127).astype(jnp.int8)


def conv_i8(x, w, stride=1, pad=None):
    k = w.shape[0]
    pad = [(k // 2, k // 2)] * 2 if pad is None else pad
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


# weights: one std 3x3 + its even3 packed twin, requant vectors
w_std = rw(3, 3, C, C)
w_e3 = jnp.asarray(S.w3_pack_even3(w_std))
w_std = jnp.asarray(w_std)
m_std = jnp.asarray(rng.uniform(1e-4, 2e-4, C), jnp.float32)
b_std = jnp.asarray(rng.uniform(-0.1, 0.1, C), jnp.float32)
m_e3 = jnp.asarray(S.tile_vec(np.asarray(m_std)), jnp.float32)
b_e3 = jnp.asarray(S.tile_vec(np.asarray(b_std)), jnp.float32)

x_std = jnp.asarray(rng.integers(-100, 100, (B, H, H, C)), jnp.int8)
x_e3 = jnp.asarray(S.pack_even(x_std))

# ---- S0: single conv + requant ---------------------------------------
print("== S0 single conv+requant ==", flush=True)


def s0_std(x, c):
    xi = (x.astype(jnp.int32) + (c * 1e-20).astype(jnp.int32)).astype(jnp.int8)
    y = conv_i8(xi, w_std)
    return jnp.sum(requant(jnp.maximum(y.astype(jnp.float32) * m_std + b_std, 0)).astype(jnp.float32)) * 1e-9


def s0_e3(x, c):
    xi = (x.astype(jnp.int32) + (c * 1e-20).astype(jnp.int32)).astype(jnp.int8)
    y = S.conv_even3(xi, w_e3)
    return jnp.sum(requant(jnp.maximum(y.astype(jnp.float32) * m_e3 + b_e3, 0)).astype(jnp.float32)) * 1e-9


report("S0 direct 3x3x32 @128^2", marginal(scanner(s0_std), x_std))
report("S0 even3 2x2-packed @64^2", marginal(scanner(s0_e3), x_e3))

# ---- S1: 4-block chain -----------------------------------------------
print("== S1 4-block chain ==", flush=True)
cf = jnp.asarray([0.7, 0.8], jnp.float32)


def s1_std(x, c):
    cur = (x.astype(jnp.int32) + (c * 1e-20).astype(jnp.int32)).astype(jnp.int8)
    for _ in range(4):
        y = conv_i8(cur, w_std)
        y = requant(jnp.maximum(y.astype(jnp.float32) * m_std + b_std, 0))
        y = conv_i8(y, w_std)
        y = requant(y.astype(jnp.float32) * m_std + b_std)
        cur = requant(jnp.maximum(y.astype(jnp.float32) * cf[0] + cur.astype(jnp.float32) * cf[1], 0))
    return jnp.sum(cur.astype(jnp.float32)) * 1e-9


def s1_e3(x, c):
    cur = (x.astype(jnp.int32) + (c * 1e-20).astype(jnp.int32)).astype(jnp.int8)
    for _ in range(4):
        y = S.conv_even3(cur, w_e3)
        y = requant(jnp.maximum(y.astype(jnp.float32) * m_e3 + b_e3, 0))
        y = S.conv_even3(y, w_e3)
        y = requant(y.astype(jnp.float32) * m_e3 + b_e3)
        cur = requant(jnp.maximum(y.astype(jnp.float32) * cf[0] + cur.astype(jnp.float32) * cf[1], 0))
    return jnp.sum(cur.astype(jnp.float32)) * 1e-9


report("S1 direct chain x4", marginal(scanner(s1_std), x_std))
report("S1 even3 chain x4", marginal(scanner(s1_e3), x_e3))

# ---- S2: fuse exchange into branch0 ----------------------------------
print("== S2 fuse exchange ==", flush=True)
ys = [
    jnp.asarray(rng.integers(-100, 100, (B, H // (2 ** j), H // (2 ** j), C * (2 ** j))), jnp.int8)
    for j in range(4)
]
wu = [jnp.asarray(rw(1, 1, C * (2 ** j), C)) for j in range(1, 4)]
mu = [jnp.asarray(rng.uniform(1e-4, 2e-4, C), jnp.float32) for _ in range(3)]
coef = jnp.asarray(rng.uniform(0.3, 0.9, 4), jnp.float32)


def upsample_i8(x, f):
    b, h, w, c = x.shape
    y = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, f, w, f, c))
    return y.reshape(b, h * f, w * f, c)


def s2_std(y0, c):
    yi = (y0.astype(jnp.int32) + (c * 1e-20).astype(jnp.int32)).astype(jnp.int8)
    acc = yi.astype(jnp.float32) * coef[0]
    for j in range(1, 4):
        u = conv_i8(ys[j], wu[j - 1], pad=[(0, 0), (0, 0)])
        u8 = requant(u.astype(jnp.float32) * mu[j - 1])
        acc = acc + upsample_i8(u8, 2 ** j).astype(jnp.float32) * coef[j]
    return jnp.sum(requant(jnp.maximum(acc, 0)).astype(jnp.float32)) * 1e-9


y0_e3 = jnp.asarray(S.pack_even(ys[0]))
mu_e = [jnp.asarray(S.tile_vec(np.asarray(m)), jnp.float32) for m in mu]


def s2_e3(y0, c):
    yi = (y0.astype(jnp.int32) + (c * 1e-20).astype(jnp.int32)).astype(jnp.int8)
    acc = yi.astype(jnp.float32) * coef[0]
    for j in range(1, 4):
        u = conv_i8(ys[j], wu[j - 1], pad=[(0, 0), (0, 0)])
        u8 = requant(u.astype(jnp.float32) * mu[j - 1])
        acc = acc + S.upsample_std_to_even(u8, 2 ** j).astype(jnp.float32) * coef[j]
    return jnp.sum(requant(jnp.maximum(acc, 0)).astype(jnp.float32)) * 1e-9


report("S2 direct fuse out0", marginal(scanner(s2_std), ys[0]))
report("S2 even3 fuse out0", marginal(scanner(s2_e3), y0_e3))

print("probe_r3f done", flush=True)
