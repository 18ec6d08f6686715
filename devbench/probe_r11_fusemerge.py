"""Fuse-layer 1x1 / down-k0 output-concat merge micro probe (VERDICT r3 #4b).

HRNet fuse exchanges issue several small convs that READ THE SAME
input: (a) the up-path 1x1 convs from branch j to every i<j (output
lanes 32/64/128 — under the 128-lane MXU tile), and (b) the k=0 convs
of the down chains from branch j to every i>j (3x3 stride-2, the
128^2-branch ones are the expensive 32-lane sites). Concatenating each
family along the output axis yields one full(er)-lane conv + static
slices. This probe times separate-vs-merged at the exact W32 b128
serving shapes to bound the model-level win before building it.

Shapes (W32, batch 128):
  stage4 ups   j=3: 16^2x256  -> 1x1 out {32,64,128} vs one 224
               j=2: 32^2x128  -> 1x1 out {32,64}     vs one 96
  stage3/4 downs j=0: 128^2x32 -> 3x3 s2 out {64,32,32} vs one 128
  stage4 downs j=1: 64^2x64    -> 3x3 s2 out {128,64}  vs one 192

Usage: python devbench/probe_r11_fusemerge.py [batch]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128


def conv(x, w, stride):
    k = w.shape[0]
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def requant(y, m, b):
    f = y.astype(jnp.float32) * m + b
    return jnp.clip(jnp.round(f), -127, 127).astype(jnp.int8)


def bench_case(name, hw, cin, outs, k, stride):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 127, (B, hw, hw, cin)), jnp.int8)
    ws = [jnp.asarray(rng.integers(-127, 127, (k, k, cin, o)), jnp.int8)
          for o in outs]
    ms = [jnp.asarray(rng.uniform(1e-3, 2e-3, o), jnp.float32) for o in outs]
    bs = [jnp.asarray(rng.uniform(-1, 1, o), jnp.float32) for o in outs]
    wm = jnp.concatenate(ws, axis=-1)
    mm = jnp.concatenate(ms)
    bm = jnp.concatenate(bs)

    @jax.jit
    def sep(x):
        return [requant(conv(x, w, stride), m, b)
                for w, m, b in zip(ws, ms, bs)]

    @jax.jit
    def merged(x):
        y = requant(conv(x, wm, stride), mm, bm)
        off, parts = 0, []
        for o in outs:
            parts.append(y[..., off:off + o])
            off += o
        return parts

    def timeit(fn):
        jax.block_until_ready(fn(x))
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(x))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # exactness: merged slices == separate outputs
    a, b_ = sep(x), merged(x)
    d = max(float(jnp.abs(ai.astype(jnp.int32) - bi.astype(jnp.int32)).max())
            for ai, bi in zip(a, b_))
    ts, tm = timeit(sep), timeit(merged)
    print(f"[{name}] sep {ts*1e3:.3f} ms  merged {tm*1e3:.3f} ms  "
          f"({ts/tm:.2f}x)  max|d|={d:.0f}", flush=True)
    return ts - tm


gain = 0.0
gain += 2 * bench_case("s4 ups j=3 (x2 modules)", 16, 256, (32, 64, 128), 1, 1)
gain += 2 * bench_case("s4 ups j=2 (x2 modules)", 32, 128, (32, 64), 1, 1)
gain += 4 * bench_case("s3 downs j=0 (x4 modules)", 128, 32, (64, 32), 3, 2)
gain += 2 * bench_case("s4 downs j=0 (x2 modules)", 128, 32, (64, 32, 32), 3, 2)
gain += 2 * bench_case("s4 downs j=1 (x2 modules)", 64, 64, (128, 64), 3, 2)
gain += 4 * bench_case("s3 ups j=2 (x4 modules)", 32, 128, (32, 64), 1, 1)
print(f"[total] modeled saving across sites: {gain*1e3:.2f} ms/b{B}", flush=True)
