"""HRNet-W32 hotspot decomposition on the real chip (dev tool, round 2).

Hypothesis space for the 512^2 model at batch 128 (~0.9 ms/frame bf16,
~20% MXU): (a) the 32-ch high-res branch is HBM-bound (activations are
(B,128,128,32) = 128 MB bf16 per tensor, each conv reads+writes them),
(b) narrow-N matmuls cap MXU util at ~19-25%, (c) fuse/upsample layers.

Stages:
  branches  — per-branch conv-chain timings at W32 widths/resolutions
  blocks    — BasicBlock chain (2 convs + residual) vs 2 lone convs:
              does XLA fuse residual+BN+relu well?
  model     — full HRNet fwd at several batches (bf16 + int8)
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
            out = body(*args, c)
            return c + out * 1e-20, None

        c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
        return c

    return fn


def branch_probe(batch=128):
    """One 3x3 conv at each W32 branch shape, bf16."""
    rng = np.random.default_rng(0)
    shapes = [(128, 32), (64, 64), (32, 128), (16, 256)]
    for hw, c in shapes:
        x = jnp.asarray(rng.normal(size=(batch, hw, hw, c)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.05, jnp.bfloat16)

        def body(x, k, pert):
            y = jax.lax.conv_general_dilated(
                x + pert.astype(jnp.bfloat16), k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return jnp.sum(y.astype(jnp.float32)) * 1e-9

        v = marginal(scanner(body), x, k)
        flops = 2 * batch * hw * hw * 9 * c * c
        bytes_ = 2 * batch * hw * hw * c * 2  # read x + write y, bf16
        print(
            f"conv3x3 {c:3d}ch {hw:3d}^2 b{batch}: {v * 1e3:8.3f} ms  "
            f"{flops / v / 1e12:6.1f} TFLOP/s  {bytes_ / v / 1e9:7.1f} GB/s",
            flush=True,
        )


def chain_probe(batch=128, hw=128, c=32, n_convs=8):
    """A chain of n 3x3 convs at the high-res shape: XLA cannot fuse
    conv->conv, so time should be ~n x single-conv (IO-bound)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, hw, hw, c)), jnp.bfloat16)
    ks = jnp.asarray(rng.normal(size=(n_convs, 3, 3, c, c)) * 0.05, jnp.bfloat16)

    def body(x, ks, pert):
        y = x + pert.astype(jnp.bfloat16)
        for i in range(n_convs):
            y = jax.nn.relu(
                jax.lax.conv_general_dilated(
                    y, ks[i], (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            )
        return jnp.sum(y.astype(jnp.float32)) * 1e-9

    v = marginal(scanner(body), x, ks)
    print(
        f"chain x{n_convs} conv3x3 {c}ch {hw}^2 b{batch}: {v * 1e3:8.3f} ms "
        f"({v / n_convs * 1e3:6.3f} ms/conv)",
        flush=True,
    )


def model_probe(batches=(128,), mode="bf16"):
    from spacecraft_pose_estimation_tpu.models.hrnet import HRNet, POSE_HRNET_W32

    rng = np.random.default_rng(0)
    model = HRNet(config=POSE_HRNET_W32.with_joints(11), dtype=jnp.bfloat16)
    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, 512, 512, 3)), train=False)
    )(jax.random.key(0))

    serving_model, serving_vars = model, variables
    if mode == "int8":
        from spacecraft_pose_estimation_tpu.models.hrnet_int8 import (
            HRNetInt8,
            quantize_hrnet,
        )

        calib = jnp.asarray(rng.normal(size=(4, 512, 512, 3)), jnp.float32)
        serving_vars = quantize_hrnet(model, variables, calib)
        serving_model = HRNetInt8(model.config)

    for batch in batches:
        x = jnp.asarray(rng.normal(size=(batch, 512, 512, 3)), jnp.float32)

        def body(v, x, pert):
            out = serving_model.apply(v, x + pert, train=False)
            return jnp.sum(out.astype(jnp.float32)) * 1e-9

        v = marginal(scanner(body), serving_vars, x)
        print(
            f"hrnet_w32 512^2 {mode} b{batch}: {v * 1e3:8.2f} ms/batch "
            f"({v / batch * 1e3:6.3f} ms/im, {batch / v:7.1f} fps)",
            flush=True,
        )


def int8_conv_probe(batch=128):
    """int8 conv rates at the HRNet shapes: is XLA hitting the doubled
    ceilings (N/128 * 788 TOPS, ~819 GB/s at half traffic)?"""
    rng = np.random.default_rng(0)
    shapes = [(128, 32), (64, 64), (128, 64), (16, 256)]
    for hw, c in shapes:
        x = jnp.asarray(rng.integers(-127, 127, (batch, hw, hw, c)), jnp.int8)
        k = jnp.asarray(rng.integers(-127, 127, (3, 3, c, c)), jnp.int8)
        sc = jnp.float32(0.01)

        def body(x, k, pert):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            yq = jnp.clip(jnp.round(y.astype(jnp.float32) * (sc + pert * 1e-20)), -127, 127).astype(jnp.int8)
            return jnp.sum(yq.astype(jnp.float32)) * 1e-9

        v = marginal(scanner(body), x, k)
        ops = 2 * batch * hw * hw * 9 * c * c
        print(
            f"int8 conv3x3 {c:3d}ch {hw:3d}^2 b{batch}: {v * 1e3:8.3f} ms  "
            f"{ops / v / 1e12:6.1f} TOP/s",
            flush=True,
        )


def int8_model_parts(batch=128):
    """Stem + layer1 vs stages under int8: find the non-branch time."""
    from spacecraft_pose_estimation_tpu.models.hrnet import HRNet, POSE_HRNET_W32
    from spacecraft_pose_estimation_tpu.models.hrnet_int8 import (
        HRNetInt8,
        quantize_hrnet,
    )
    from spacecraft_pose_estimation_tpu.pipeline import normalize_crops

    rng = np.random.default_rng(0)
    model = HRNet(config=POSE_HRNET_W32.with_joints(11), dtype=jnp.bfloat16)
    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, 512, 512, 3)), train=False)
    )(jax.random.key(0))
    calib = normalize_crops(
        jnp.asarray(rng.integers(0, 255, (4, 512, 512, 3)), jnp.float32)
    )
    q = quantize_hrnet(model, variables, calib)
    m8 = HRNetInt8(model.config)
    x = jnp.asarray(rng.normal(size=(batch, 512, 512, 3)), jnp.float32)

    def body(v, x, pert):
        out = m8.apply(v, x + pert, train=False)
        return jnp.sum(out.astype(jnp.float32)) * 1e-9

    v = marginal(scanner(body), q, x)
    print(f"int8 full model b{batch}: {v * 1e3:8.2f} ms ({batch / v:7.1f} fps)",
          flush=True)


if __name__ == "__main__":
    stages = sys.argv[1:] or ["branches", "chain"]
    if "int8conv" in stages:
        int8_conv_probe()
    if "int8model" in stages:
        int8_model_parts()
    if "branches" in stages:
        branch_probe()
    if "chain" in stages:
        chain_probe()
    if "model" in stages:
        model_probe()
    if "model_int8" in stages:
        model_probe(mode="int8")
    if "model_sweep" in stages:
        model_probe(batches=(64, 128, 256))
