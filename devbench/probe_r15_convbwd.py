"""Per-shape conv forward vs backward cost on the X101 backbone shapes.

The r5 decomposition (r5_trainstep_queue) measured fwd = 113 ms vs
full step = ~765 ms at config_1 800^2 b16 — backward is ~5.7x forward
where ~2x is the FLOP ratio. This probe times, per representative
layer shape, (a) forward conv, (b) grad wrt input, (c) grad wrt
weights, for the MergedGroupConv lowering (merged fgc = g/m) and the
dense 1x1s, to find which backward op lowers badly on TPU.

Usage: python devbench/probe_r15_convbwd.py [batch]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16

# (name, H, cin, cout, k, stride, fgc_after_merge, m)
# X101-32x8d at 800^2: res2 200^2, res3 100^2, res4 50^2, res5 25^2.
# MergedGroupConv merges to 128-wide: res2 cgi=8 -> m=16 (fgc=2),
# res3 cgi=16 -> m=8 (fgc=4), res4 cgi=32 -> m=4 (fgc=8),
# res5 cgi=64 -> m=2 (fgc=16). Merged kernel is (k,k,m*cgi,cout).
SHAPES = [
    ("res2 3x3g", 200, 256, 256, 3, 1, 2),
    ("res3 3x3g", 100, 512, 512, 3, 1, 4),
    ("res4 3x3g", 50, 1024, 1024, 3, 1, 8),
    ("res5 3x3g", 25, 2048, 2048, 3, 1, 16),
    ("res4 1x1 dense", 50, 1024, 1024, 1, 1, 1),
    ("res2 1x1 dense", 200, 256, 256, 1, 1, 1),
]


def run_shape(name, h, cin, cout, k, stride, fgc):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, h, h, cin)).astype(np.float32), jnp.bfloat16)
    # merged kernel layout: (k, k, cin/fgc, cout)
    w = jnp.asarray(
        rng.normal(size=(k, k, cin // fgc, cout)).astype(np.float32), jnp.bfloat16
    )
    pad = (k - 1) // 2

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=fgc,
        )

    # scan-marginal scheme per op kind, scalar readback
    def rep_of(body):
        @jax.jit
        def rep(x, w, n):
            def it(i, c):
                out = body(x + (c * 1e-20).astype(x.dtype), w)
                return c + out.astype(jnp.float32) * 1e-20

            return jax.lax.fori_loop(0, n, it, jnp.float32(0.0))

        return rep

    # dw: cotangent of sum() is ones and the primal conv is DCE'd, but
    # dw = dwconv(x, ones) depends on the loop-perturbed x -> stays in
    # the loop; times the pure weight-gradient op.
    # dx with a sum() loss is LINEAR in w only (dx = dxconv(ones, w)) —
    # loop-invariant, hoisted, measures 0 (first probe run). Use the
    # squared loss instead: grad = dxconv(conv(x, w), w), so the "fwdx2"
    # graph is fwd + dx and dx ~= fwdx2 - fwd.
    fwd = rep_of(lambda x, w: jnp.sum(conv(x, w).astype(jnp.float32)))
    fwdx2 = rep_of(lambda x, w: jnp.sum(
        jax.grad(
            lambda xi: 0.5 * jnp.sum(conv(xi, w).astype(jnp.float32) ** 2)
        )(x).astype(jnp.float32)
    ))
    dw = rep_of(lambda x, w: jnp.sum(
        jax.grad(lambda wi: jnp.sum(conv(x, wi).astype(jnp.float32)))(w)
        .astype(jnp.float32)
    ))

    out = {}
    for kind, rep in (("fwd", fwd), ("fwdx2", fwdx2), ("dw", dw)):
        exe = rep.lower(x, w, jnp.asarray(0, jnp.int32)).compile()

        def t(n):
            t0 = time.perf_counter()
            float(exe(x, w, jnp.asarray(n, jnp.int32)))
            return time.perf_counter() - t0

        t(1); t(5)
        dt = max((min(t(5) for _ in range(3)) - min(t(1) for _ in range(3))) / 4, 1e-9)
        out[kind] = dt
    gflop = 2 * B * (h // stride) ** 2 * k * k * (cin // fgc) * cout / 1e9
    dx = max(out["fwdx2"] - out["fwd"], 1e-9)
    print(
        f"[{name:15s}] fwd {out['fwd']*1e3:7.2f} ms ({gflop/out['fwd']/1e3:6.1f} TF/s)  "
        f"dx~ {dx*1e3:7.2f} ms ({gflop/dx/1e3:6.1f})  "
        f"dw {out['dw']*1e3:7.2f} ms ({gflop/out['dw']/1e3:6.1f})",
        flush=True,
    )


for s in SHAPES:
    run_shape(*s)
