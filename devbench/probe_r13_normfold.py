"""Normalize-fold-into-stem probe (VERDICT r3 #4a, second lever).

Serving today: bf16 crops -> normalize_crops (f32, a 402 MB/b128 HBM
write + read) -> stem1 bf16 conv. Folding (x-mean)/std into stem1's
weights (w' = w/std per input channel, bias -= sum(w*mean/std)) lets
the stem consume the bf16 crops directly. Interior outputs are
identical; the 1-px stem border ring changes meaning (zero padding
becomes raw-black instead of mean-gray) — acceptable under the int8
pose-error bound if the time win is real.

Times the crop-facing segment (normalize + stem1 + requant-to-int8) at
the serving batch, A/B, plus max|d| on the interior.

Usage: python devbench/probe_r13_normfold.py [batch]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
MEAN = np.array([0.485, 0.456, 0.406], np.float32) * 255.0
STD = np.array([0.229, 0.224, 0.225], np.float32) * 255.0

rng = np.random.default_rng(0)
crops = jnp.asarray(rng.integers(0, 255, (B, 512, 512, 3)), jnp.bfloat16)
w = jnp.asarray(rng.normal(0, 0.05, (3, 3, 3, 64)), jnp.bfloat16)
m = jnp.asarray(rng.uniform(0.5, 1.5, 64), jnp.float32)
b = jnp.asarray(rng.normal(0, 0.1, 64), jnp.float32)

w_fold = (np.asarray(w, np.float32) / STD[None, None, :, None]).astype(
    np.float32
)
b_fold = b - jnp.asarray(
    (w_fold * MEAN[None, None, :, None]).sum((0, 1, 2)) * np.asarray(m)
)
w_fold = jnp.asarray(w_fold, jnp.bfloat16)


def stem(x, w, m, b):
    y = jax.lax.conv_general_dilated(
        x, w, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    f = jnp.maximum(y.astype(jnp.float32) * m + b, 0)
    return jnp.clip(jnp.round(f), -127, 127).astype(jnp.int8)


@jax.jit
def base(crops):
    mean = jnp.asarray(MEAN)
    std = jnp.asarray(STD)
    xn = (crops.astype(jnp.float32) - mean) / std
    return stem(xn.astype(jnp.bfloat16), w, m, b)


@jax.jit
def folded(crops):
    return stem(crops, w_fold, m, b_fold)


def timeit(fn):
    fn(crops).block_until_ready()
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        fn(crops).block_until_ready()
        ts.append(time.perf_counter() - t0)
    return min(ts)


a = np.asarray(base(crops), np.int32)
f = np.asarray(folded(crops), np.int32)
inner = np.abs(a[:, 1:-1, 1:-1] - f[:, 1:-1, 1:-1]).max()
edge = np.abs(a - f).max()
ta, tf = timeit(base), timeit(folded)
print(f"[normfold] base {ta*1e3:.2f} ms  folded {tf*1e3:.2f} ms  "
      f"save {(ta-tf)*1e3:.2f} ms/b{B}", flush=True)
print(f"[normfold] |d| interior={inner} (bf16 rounding) edge={edge} "
      f"(border semantics)", flush=True)
