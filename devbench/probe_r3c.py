"""Round-3c: (1) strips-kernel pad-fix validation (compile + bit-exact
vs per-op + time), (2) e2e primary retime with the full serving combo
(even3 s2d + int8 full-frame crop + layer1 strips)."""
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
    print(f"{name:46s}: {t*1e3:8.3f} ms", flush=True)


B = 128
rng = np.random.default_rng(0)

# ---- 1. strips kernel: pad-fix validation ----------------------------
print("== strips kernel (cin pad fix) ==", flush=True)
from spacecraft_pose_estimation_tpu.ops.pallas_blocks import (
    fused_bottleneck_chain_strips,
)


def rw(*shape, hi=40):
    return jnp.asarray(rng.integers(-hi, hi, shape), jnp.int8)


def rf(*shape):
    return jnp.asarray(rng.uniform(5e-4, 2e-3, shape), jnp.float32)


cin0, cm, cout, nb = 64, 64, 256, 4
w1 = np.zeros((nb, cout, cm), np.int8)
w1[0, :cin0] = np.asarray(rw(cin0, cm))
for k in range(1, nb):
    w1[k] = np.asarray(rw(cout, cm))
params = dict(
    w1=jnp.asarray(w1), m1=rf(nb, cm), b1=rf(nb, cm),
    w2=rw(nb, 3, 3, cm, cm), m2=rf(nb, cm), b2=rf(nb, cm),
    w3=rw(nb, cm, cout), m3=rf(nb, cout), b3=rf(nb, cout),
    wd=rw(cin0, cout), md=rf(cout), bd=rf(cout),
    coeffs=rf(nb, 2),
)


def strips(x):
    return fused_bottleneck_chain_strips(
        x, params["w1"], params["m1"], params["b1"],
        params["w2"], params["m2"], params["b2"],
        params["w3"], params["m3"], params["b3"],
        params["wd"], params["md"], params["bd"],
        params["coeffs"], nb, strip=32,
    )


def perop(x):
    def requant(f):
        return jnp.clip(jnp.round(f), -127, 127).astype(jnp.int8)

    cur = x
    for blk in range(4):
        kin = 64 if blk == 0 else 256
        src = cur
        f1 = jax.lax.conv_general_dilated(
            src, params["w1"][blk, :kin][None, None], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        x1 = requant(jnp.maximum(f1 * params["m1"][blk] + params["b1"][blk], 0))
        y2 = jax.lax.conv_general_dilated(
            x1, params["w2"][blk], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        x2 = requant(jnp.maximum(y2 * params["m2"][blk] + params["b2"][blk], 0))
        f3 = jax.lax.conv_general_dilated(
            x2, params["w3"][blk][None, None], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        x3 = requant(f3 * params["m3"][blk] + params["b3"][blk])
        if blk == 0:
            fr = jax.lax.conv_general_dilated(
                src, params["wd"][None, None], (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            r = requant(fr * params["md"] + params["bd"])
        else:
            r = cur
        f = x3.astype(jnp.float32) * params["coeffs"][blk, 0] + r.astype(
            jnp.float32
        ) * params["coeffs"][blk, 1]
        cur = requant(jnp.maximum(f, 0))
    return cur


try:
    x8 = jnp.asarray(rng.integers(-80, 80, (8, 128, 128, cin0)), jnp.int8)
    out_s = np.asarray(jax.jit(strips)(x8))
    out_p = np.asarray(jax.jit(perop)(x8))
    n_bad = int((out_s != out_p).sum())
    print(f"strips vs per-op b8: mismatches={n_bad} / {out_s.size}", flush=True)

    x128 = jnp.asarray(rng.integers(-80, 80, (B, 128, 128, cin0)), jnp.int8)

    def strips_body(x, c):
        xi = (x.astype(jnp.int32) + (c * 1e-20).astype(jnp.int32)).astype(jnp.int8)
        return jnp.sum(strips(xi).astype(jnp.float32)) * 1e-9

    t = marginal(scanner(strips_body), x128)
    report("layer1 strips kernel b128 128^2", t)

    def perop_body(x, c):
        xi = (x.astype(jnp.int32) + (c * 1e-20).astype(jnp.int32)).astype(jnp.int8)
        return jnp.sum(perop(xi).astype(jnp.float32)) * 1e-9

    t = marginal(scanner(perop_body), x128)
    report("layer1 per-op XLA b128 128^2", t)
except Exception as e:
    print(f"strips kernel FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

# ---- 2. e2e primary (bench-identical) --------------------------------
print("== e2e primary (even3 + int8 crop + strips) ==", flush=True)
import bench

for strips_on in (True, False):
    try:
        import spacecraft_pose_estimation_tpu.models.hrnet_int8 as hi

        class _Patched(hi.HRNetInt8):
            def __init__(self, config, **kw):
                kw["layer1_strips"] = strips_on
                super().__init__(config, **kw)

        orig = hi.HRNetInt8
        hi.HRNetInt8 = _Patched
        try:
            timed = bench.build(B, "int8")
        finally:
            hi.HRNetInt8 = orig
        timed(2)
        timed(10)
        t_lo = min(timed(2) for _ in range(3))
        t_hi = min(timed(10) for _ in range(3))
        dt = (t_hi - t_lo) / 8
        print(
            f"e2e primary strips={strips_on}: {dt*1e3/B:.4f} ms/frame = {B/dt:.1f} fps",
            flush=True,
        )
    except Exception as e:
        print(f"e2e strips={strips_on} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

print("probe_r3c done", flush=True)
