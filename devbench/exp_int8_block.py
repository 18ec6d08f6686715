"""Does the int8 BasicBlock (conv-requant-relu-conv-add-requant) run at
~2x the single-conv cost, or do the f32 epilogues materialize?"""
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

batch, hw, c = 128, 128, 32
rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(-127, 127, (batch, hw, hw, c)), jnp.int8)
k1 = jnp.asarray(rng.integers(-127, 127, (3, 3, c, c)), jnp.int8)
k2 = jnp.asarray(rng.integers(-127, 127, (3, 3, c, c)), jnp.int8)

def conv8(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)

def requant(y32, mult):
    return jnp.clip(jnp.round(y32.astype(jnp.float32) * mult), -127, 127).astype(jnp.int8)

def block_body(x, k1, k2, pert):
    m1 = jnp.float32(0.01) + pert * 1e-20
    y = requant(conv8(x, k1), m1)
    y = jnp.maximum(y, 0)
    y = conv8(y, k2)
    # residual add in f32 from int8 operands, requantize (hrnet_int8 style)
    out = requant(y, m1) .astype(jnp.int32) + x.astype(jnp.int32)
    out = jnp.clip(out, -127, 127).astype(jnp.int8)
    out = jnp.maximum(out, 0)
    return jnp.sum(out.astype(jnp.float32)) * 1e-9

v = marginal(scanner(block_body), x, k1, k2)
print(f"int8 basicblock 32ch 128^2 b128: {v*1e3:8.3f} ms ({v/2*1e3:6.3f} ms/conv-equiv)", flush=True)
