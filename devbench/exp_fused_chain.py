"""Fused branch-chain kernel vs per-op XLA walk, on the real chip."""
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
        t0 = time.perf_counter(); _ = float(fn(n, *args)); return time.perf_counter() - t0
    timed(N_LO); timed(N_HI)
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

from spacecraft_pose_estimation_tpu.ops.pallas_blocks import fused_basic_block_chain

def bench_shape(batch, hw, c, nblocks=4):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-80, 80, (batch, hw, hw, c)), jnp.int8)
    w = jnp.asarray(rng.integers(-40, 40, (nblocks, 2, 3, 3, c, c)), jnp.int8)
    m = jnp.asarray(rng.uniform(5e-4, 2e-3, (nblocks, 2, c)), jnp.float32)
    b = jnp.asarray(rng.uniform(-0.3, 0.3, (nblocks, 2, c)), jnp.float32)
    cf = jnp.asarray(rng.uniform(0.4, 1.2, (nblocks, 2)), jnp.float32)

    def fused_body(x, w, m, b, cf, pert):
        xi = (x.astype(jnp.int32) + (pert * 1e-20).astype(jnp.int32)).astype(jnp.int8)
        out = fused_basic_block_chain(xi, w, m, b, cf, nblocks)
        return jnp.sum(out.astype(jnp.float32)) * 1e-9

    def perop_body(x, w, m, b, cf, pert):
        def conv(xi, wk):
            return jax.lax.conv_general_dilated(
                xi, wk, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
        def requant(f):
            return jnp.clip(jnp.round(f), -127, 127).astype(jnp.int8)
        xi = (x.astype(jnp.int32) + (pert * 1e-20).astype(jnp.int32)).astype(jnp.int8)
        for blk in range(nblocks):
            f1 = conv(xi, w[blk, 0]).astype(jnp.float32) * m[blk, 0] + b[blk, 0]
            x1 = requant(jnp.maximum(f1, 0.0))
            f2 = conv(x1, w[blk, 1]).astype(jnp.float32) * m[blk, 1] + b[blk, 1]
            x2 = requant(f2)
            f = x2.astype(jnp.float32) * cf[blk, 0] + xi.astype(jnp.float32) * cf[blk, 1]
            xi = requant(jnp.maximum(f, 0.0))
        return jnp.sum(xi.astype(jnp.float32)) * 1e-9

    v_per = marginal(scanner(perop_body), x, w, m, b, cf)
    v_fus = marginal(scanner(fused_body), x, w, m, b, cf)
    print(f"chain {nblocks}x blocks {c:3d}ch {hw:3d}^2 b{batch}: "
          f"per-op {v_per*1e3:7.3f} ms   fused {v_fus*1e3:7.3f} ms   "
          f"({v_per/max(v_fus,1e-9):4.2f}x)", flush=True)

if __name__ == "__main__":
    shapes = sys.argv[1:] or ["32", "64"]
    if "32" in shapes:
        bench_shape(128, 128, 32)
    if "64" in shapes:
        bench_shape(128, 64, 64)
    if "128" in shapes:
        bench_shape(128, 32, 128)
    if "256" in shapes:
        bench_shape(128, 16, 256)
