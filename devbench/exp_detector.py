"""Detector perf experiments on the real chip (dev tool, round 2).

Measures the X101-FPN inference decomposition at 768^2 and probes the
grouped-conv hypothesis: ResNeXt's 32x8d grouped 3x3 convs underfill the
MXU contraction; compare grouped vs dense variants.

Run: python devbench/exp_detector.py [stage ...]
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

N_LO, N_HI = 2, 6


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


def conv_probe(batch=8, hw=96, cin=512, cout=512, groups=32):
    """Grouped vs dense 3x3 conv at a res4-like shape."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, hw, hw, cin)), jnp.bfloat16)

    for g in (groups, 1):
        k = jnp.asarray(rng.normal(size=(3, 3, cin // g, cout)) * 0.05, jnp.bfloat16)

        def body(x, k, pert):
            y = jax.lax.conv_general_dilated(
                x + pert.astype(jnp.bfloat16), k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=g,
            )
            return jnp.sum(y.astype(jnp.float32)) * 1e-9

        fn = scanner(body)
        v = marginal(fn, x, k)
        flops = 2 * batch * hw * hw * 9 * (cin // g) * cout
        print(
            f"conv3x3 {cin}->{cout} g={g:3d} b{batch} {hw}x{hw}: "
            f"{v * 1e3:8.3f} ms  {flops / v / 1e12:6.1f} TFLOP/s",
            flush=True,
        )


def backbone_probe(batch=8, size=768):
    from spacecraft_pose_estimation_tpu.models.rcnn import FASTER_RCNN_X101_SPACECRAFT
    from spacecraft_pose_estimation_tpu.models.resnet_backbone import ResNetBackbone

    cfg = FASTER_RCNN_X101_SPACECRAFT.backbone
    model = ResNetBackbone(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, size, size, 3)) * 50 + 100, jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), x[:1])

    def body(v, x, pert):
        feats = model.apply(v, x + pert)
        return sum(jnp.sum(f.astype(jnp.float32)) for f in feats.values()) * 1e-9

    fn = scanner(body)
    v = marginal(fn, variables, x)
    print(f"x101 backbone b{batch} {size}^2: {v * 1e3:8.1f} ms/batch "
          f"({v / batch * 1e3:6.2f} ms/im, {batch / v:6.1f} im/s)", flush=True)


def full_probe(batch=8, size=768):
    from spacecraft_pose_estimation_tpu.models.rcnn import (
        FASTER_RCNN_X101_SPACECRAFT,
        GeneralizedRCNN,
    )

    model = GeneralizedRCNN(config=FASTER_RCNN_X101_SPACECRAFT, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, size, size, 3)) * 50 + 100, jnp.float32)
    variables = jax.jit(partial(model.init, train=False))(
        {"params": jax.random.key(0)}, x[:1]
    )

    def body(v, x, pert):
        dets = model.apply(v, x + pert, train=False)
        return jnp.sum(dets["scores"]) * 1e-9

    fn = scanner(body)
    v = marginal(fn, variables, x)
    print(f"x101-fpn full infer b{batch} {size}^2: {v * 1e3:8.1f} ms/batch "
          f"({batch / v:6.1f} im/s)", flush=True)


def conv_group_sweep(batch=8, hw=96, cin=512, cout=512):
    """Find the group-size efficiency cliff."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, hw, hw, cin)), jnp.bfloat16)
    for g in (2, 4, 8, 16):
        k = jnp.asarray(rng.normal(size=(3, 3, cin // g, cout)) * 0.05, jnp.bfloat16)

        def body(x, k, pert):
            y = jax.lax.conv_general_dilated(
                x + pert.astype(jnp.bfloat16), k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=g,
            )
            return jnp.sum(y.astype(jnp.float32)) * 1e-9

        fn = scanner(body)
        v = marginal(fn, x, k)
        flops = 2 * batch * hw * hw * 9 * (cin // g) * cout
        print(
            f"conv3x3 {cin}->{cout} g={g:3d} b{batch} {hw}x{hw}: "
            f"{v * 1e3:8.3f} ms  {flops / v / 1e12:6.1f} TFLOP/s",
            flush=True,
        )


def decompose_probe(batch=8, size=768):
    """backbone -> +FPN -> +RPN/proposals -> full, marginal per part."""
    import flax.linen as fnn

    from spacecraft_pose_estimation_tpu.models.rcnn import (
        FASTER_RCNN_X101_SPACECRAFT,
        GeneralizedRCNN,
    )
    from spacecraft_pose_estimation_tpu.models.fpn import FPN, FPN_STRIDES
    from spacecraft_pose_estimation_tpu.models.anchors import fpn_anchors
    from spacecraft_pose_estimation_tpu.models.resnet_backbone import ResNetBackbone
    from spacecraft_pose_estimation_tpu.models.rpn import RPNHead, find_top_proposals

    cfg = FASTER_RCNN_X101_SPACECRAFT
    model = GeneralizedRCNN(config=cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, size, size, 3)) * 50 + 100, jnp.float32)
    variables = jax.jit(partial(model.init, train=False))(
        {"params": jax.random.key(0)}, x[:1]
    )
    params = variables["params"]

    bb = ResNetBackbone(cfg.backbone, dtype=jnp.bfloat16)
    fpn = FPN(cfg.fpn_channels, dtype=jnp.bfloat16)

    def upto_backbone(p, x, pert):
        feats = bb.apply({"params": p["backbone"]}, x + pert)
        return sum(jnp.sum(f.astype(jnp.float32)) for f in feats.values()) * 1e-9

    def upto_fpn(p, x, pert):
        feats = bb.apply({"params": p["backbone"]}, x + pert)
        pyr = fpn.apply({"params": p["fpn"]}, feats)
        return sum(jnp.sum(f.astype(jnp.float32)) for f in pyr.values()) * 1e-9

    num_anchors = len(cfg.anchor_aspect_ratios) * len(cfg.anchor_sizes[0])
    rpn_head = RPNHead(num_anchors, dtype=jnp.bfloat16)

    def upto_rpn(p, x, pert):
        feats = bb.apply({"params": p["backbone"]}, x + pert)
        pyr = fpn.apply({"params": p["fpn"]}, feats)
        levels = sorted(pyr.keys())
        shapes = {l: (pyr[l].shape[1], pyr[l].shape[2]) for l in levels}
        sizes = {l: cfg.anchor_sizes[i] for i, l in enumerate(levels)}
        anchors = fpn_anchors(shapes, FPN_STRIDES, sizes, cfg.anchor_aspect_ratios)
        head_out = rpn_head.apply({"params": p["rpn_head"]}, pyr)
        per_image = {l: (head_out[l][0], head_out[l][1]) for l in levels}
        pb, ps, pv = jax.vmap(
            lambda ho: find_top_proposals(ho, anchors, (size, size), cfg.rpn, False)
        )(per_image)
        return (jnp.sum(pb.astype(jnp.float32)) + jnp.sum(ps)) * 1e-9

    def full(p, x, pert):
        dets = model.apply({"params": p}, x + pert, train=False)
        return jnp.sum(dets["scores"]) * 1e-9

    parts = [("backbone", upto_backbone), ("+fpn", upto_fpn),
             ("+rpn+proposals", upto_rpn), ("full", full)]
    prev = 0.0
    for name, body in parts:
        v = marginal(scanner(body), params, x)
        print(f"{name:16s} {v * 1e3:8.1f} ms/batch  (delta {1e3 * (v - prev):+7.1f} ms)",
              flush=True)
        prev = v


def serving_probe(batch=8, size=768):
    from spacecraft_pose_estimation_tpu.models.rcnn import (
        FASTER_RCNN_X101_SERVING,
        GeneralizedRCNN,
    )

    model = GeneralizedRCNN(config=FASTER_RCNN_X101_SERVING, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, size, size, 3)) * 50 + 100, jnp.float32)
    variables = jax.jit(partial(model.init, train=False))(
        {"params": jax.random.key(0)}, x[:1]
    )

    def body(v, x, pert):
        dets = model.apply(v, x + pert, train=False)
        return jnp.sum(dets["scores"]) * 1e-9

    v = marginal(scanner(body), variables, x)
    print(f"x101-fpn SERVING infer b{batch} {size}^2: {v * 1e3:8.1f} ms/batch "
          f"({batch / v:6.1f} im/s)", flush=True)


if __name__ == "__main__":
    stages = sys.argv[1:] or ["conv", "backbone"]
    if "sweep" in stages:
        conv_group_sweep()
    if "decompose" in stages:
        decompose_probe()
    if "serving" in stages:
        serving_probe()
    if "serving16" in stages:
        serving_probe(batch=16)
    if "conv" in stages:
        conv_probe()
    if "backbone" in stages:
        backbone_probe()
    if "backbone16" in stages:
        backbone_probe(batch=16)
    if "full" in stages:
        full_probe()
    if "full16" in stages:
        full_probe(batch=16)
