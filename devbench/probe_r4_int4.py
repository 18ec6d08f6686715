"""int4 MXU rate probe (round 3): does v5e int4 double the int8 conv
ceilings through XLA?

The int8 HRNet walk sits AT its per-op rooflines (DEVNOTES round 2):
the 32ch branch at the N=32/128 lane ceiling (189.7 TOP/s) and the wide
branches near HBM. int4 is the only lever that moves BOTH ceilings
(2x MACs/pass via K-dim packing, half the weight bytes). This probe
measures, through the normal XLA conv/dot path:
  * peak-ish dot rates: int8 vs int4 vs mixed int4xint8 (W4A8)
  * conv rates at the HRNet-critical shapes (32ch@128^2, 64ch@64^2,
    1x1 64->64 @128^2 layer1 shape) and a detector-ish dense 512ch conv
Also answers: does int4 conv/dot lower AT ALL on this backend.
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


def report(name, ms, flops=None):
    rate = f"  {flops / ms * 1e-9:8.1f} TOP/s" if flops else ""
    print(f"{name:52s}: {ms * 1e3:8.3f} ms{rate}", flush=True)


rng = np.random.default_rng(0)


def mk(shape, dtype):
    a = rng.integers(-7, 8, size=shape).astype(np.int8)
    return jnp.asarray(a).astype(dtype)


# ---------------- dots ----------------
M, K, N = 1 << 17, 512, 512
flops_dot = 2.0 * M * K * N

for name, la, ra in (
    ("dot int8xint8", jnp.int8, jnp.int8),
    ("dot int4xint4", jnp.int4, jnp.int4),
    ("dot int8xint4 (A8W4)", jnp.int8, jnp.int4),
):
    try:
        lhs, rhs = mk((M, K), la), mk((K, N), ra)

        def body(lhs, rhs, c, _la=la):
            l = lhs
            if _la in (jnp.int8, jnp.int4):
                # perturbation must keep dtype: flip via int add
                l = (lhs + jnp.asarray(c * 1e-20, lhs.dtype)).astype(lhs.dtype)
            y = jax.lax.dot_general(
                l, rhs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return jnp.sum(y.astype(jnp.float32))

        fn = scanner(body)
        ms = marginal(fn, lhs, rhs)
        report(name, ms, flops_dot)
    except Exception as e:
        print(f"{name}: FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)

# ---------------- convs ----------------
def conv_probe(name, b, hw, cin, cout, k, wdtype, adtype, stride=1):
    try:
        x = mk((b, hw, hw, cin), adtype)
        w = mk((k, k, cin, cout), wdtype)

        def body(x, w, c):
            xx = (x + jnp.asarray(c * 1e-20, x.dtype)).astype(x.dtype)
            y = jax.lax.conv_general_dilated(
                xx, w, (stride, stride), [(k // 2, k // 2)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            return jnp.sum(y.astype(jnp.float32))

        fn = scanner(body)
        ms = marginal(fn, x, w)
        flops = 2.0 * b * (hw // stride) ** 2 * cin * cout * k * k
        report(name, ms, flops)
    except Exception as e:
        print(f"{name}: FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)


print("== convs: int8 vs int4 ==", flush=True)
for tag, wd, ad in (
    ("i8i8", jnp.int8, jnp.int8),
    ("w4a4", jnp.int4, jnp.int4),
    ("w4a8", jnp.int4, jnp.int8),
):
    conv_probe(f"3x3 32->32 @128^2 b128 {tag}", 128, 128, 32, 32, 3, wd, ad)
    conv_probe(f"3x3 64->64 @64^2  b128 {tag}", 128, 64, 64, 64, 3, wd, ad)
    conv_probe(f"1x1 64->64 @128^2 b128 {tag}", 128, 128, 64, 64, 1, wd, ad)
    conv_probe(f"1x1 64->256 @128^2 b128 {tag}", 128, 128, 64, 256, 1, wd, ad)
    conv_probe(f"3x3 256->256 @96^2 b8 {tag}", 8, 96, 256, 256, 3, wd, ad)

print("probe_r4_int4 done", flush=True)
