"""Per-branch A/B: direct per-op int8 walk vs fused_basic_block_chain,
at each HRNet branch shape (b128, 4 BasicBlocks = 8 convs + 4 adds).

Motivation: the measured int8 model runs ~28% over the static roofline
in stage3/stage4 (exp_int8_segments: +32.6/+28.5 ms vs 25.3/22.3 ms
rooflines) with 199/207 op sites — per-op overhead on the small grids.
The round-2 fused-chain verdict ("3x slower") was measured on branch0
(N=32-starved in-kernel dots); branches 1-3 dot at K>=576 / N>=64.
"""
import os, sys, time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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

B, NB = 128, 4
rng = np.random.default_rng(0)

for res, c in ((64, 64), (32, 128), (16, 256)):
    x = jnp.asarray(rng.integers(-127, 127, (B, res, res, c)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 127, (NB, 2, 3, 3, c, c)), jnp.int8)
    m = jnp.asarray(rng.normal(size=(NB, 2, c)) * 1e-4, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(NB, 2, c)), jnp.float32)
    coeffs = jnp.asarray(np.abs(rng.normal(size=(NB, 2))), jnp.float32)

    def body_direct(x, w, m, bias, coeffs, pert):
        h = (x.astype(jnp.float32) + pert).astype(jnp.int8)
        for k in range(NB):
            y = h
            for j in range(2):
                yi = jax.lax.conv_general_dilated(
                    y, w[k, j], (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32,
                )
                f = yi.astype(jnp.float32) * m[k, j] + bias[k, j]
                if j == 0:
                    f = jnp.maximum(f, 0)
                y = jnp.clip(jnp.round(f), -127, 127).astype(jnp.int8)
            f = y.astype(jnp.float32) * coeffs[k, 0] + h.astype(jnp.float32) * coeffs[k, 1]
            h = jnp.clip(jnp.round(jnp.maximum(f, 0)), -127, 127).astype(jnp.int8)
        return jnp.sum(h.astype(jnp.float32)) * 1e-9

    def body_fused(x, w, m, bias, coeffs, pert):
        h = (x.astype(jnp.float32) + pert).astype(jnp.int8)
        out = fused_basic_block_chain(h, w, m, bias, coeffs, NB)
        return jnp.sum(out.astype(jnp.float32)) * 1e-9

    for label, body in (("direct", body_direct), ("fused", body_fused)):
        try:
            t = marginal(scanner(body), x, w, m, bias, coeffs)
            print(f"branch {res:3d}^2 x{c:3d} {label:6s}: {t*1e3:7.3f} ms/b{B}", flush=True)
        except Exception as e:
            print(f"branch {res:3d}^2 x{c:3d} {label:6s}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
print("probe_r6 done", flush=True)
