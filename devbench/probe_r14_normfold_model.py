"""Model-level fold_normalize A/B (the probe_r7 standard of proof).

probe_r13 bounds the win on the crop-facing segment (normalize + stem1
+ requant); this times the FULL serving-side compute at the serving
batch: A = normalize_crops (f32) -> int8 walk, vs B = int8 walk with
fold_normalize=True consuming the raw bf16 crops directly. The timed
region includes the normalize for A — that HBM round trip is exactly
what the fold removes.

Usage: python devbench/probe_r14_normfold_model.py [batch]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.models.hrnet import HRNet, POSE_HRNET_W32
from spacecraft_pose_estimation_tpu.models.hrnet_int8 import (
    hrnet_int8_apply,
    quantize_hrnet,
)
from spacecraft_pose_estimation_tpu.pipeline import normalize_crops

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128

model = HRNet(config=POSE_HRNET_W32.with_joints(11), dtype=jnp.bfloat16)
variables = jax.jit(
    lambda k: model.init(k, jnp.zeros((1, 512, 512, 3)), train=False)
)(jax.random.key(0))
rng = np.random.default_rng(0)
calib = normalize_crops(
    jnp.asarray(rng.integers(0, 255, size=(4, 512, 512, 3)), jnp.float32)
)
q = quantize_hrnet(model, variables, calib, s2d=False)
# raw bf16 crops — exactly what the serving warp (warp_dtype=bfloat16)
# hands the landmark stage
raw = jnp.asarray(rng.integers(0, 255, size=(B, 512, 512, 3)), jnp.bfloat16)


def mk(fold):
    @partial(jax.jit, static_argnames="n")
    def rep(q, x, n):
        def body(c, _):
            xi = x + c * 1e-20
            if fold:
                out = hrnet_int8_apply(
                    model.config, q, xi, fold_normalize=True
                )
            else:
                out = hrnet_int8_apply(model.config, q, normalize_crops(xi))
            return c + jnp.sum(out[0, 0, 0]).astype(jnp.float32) * 1e-20, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return c

    return rep


for fold in (False, True):
    rep = mk(fold)
    t0 = time.time()
    lo = rep.lower(q, raw, 1).compile()
    hi = rep.lower(q, raw, 6).compile()
    print(f"[fold={fold}] compiled in {time.time()-t0:.0f}s", flush=True)

    def timed(e):
        t0 = time.perf_counter()
        float(e(q, raw))
        return time.perf_counter() - t0

    timed(lo); timed(hi)
    t1 = min(timed(lo) for _ in range(3))
    t6 = min(timed(hi) for _ in range(3))
    dt = (t6 - t1) / 5
    print(f"[fold={fold}] {dt*1e3:.2f} ms/b{B}  "
          f"{B/dt:.1f} fps model-only(+normalize)", flush=True)
