"""Detector train-step decomposition probe (VERDICT r3 #8).

Where do the 765 ms/iter (config_1 800^2 b16) go? Times on one chip:
  fwd       loss forward only (train=True losses, no grad)
  full      value_and_grad + sgd-momentum update (the real step)
  bb_frozen value_and_grad with stop_gradient after the backbone
            (backward skips backbone+fpn -> isolates their bwd share)
plus XLA cost-model flops for each graph (scan-body counting).

Usage: python devbench/probe_r9_trainstep.py [batch] [size]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.models.rcnn import GeneralizedRCNN
from spacecraft_pose_estimation_tpu.models.zoo import DETECTOR_PRESETS
from spacecraft_pose_estimation_tpu.train.detection_state import DetTrainState
from spacecraft_pose_estimation_tpu.train.optim import build_optimizer

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
S = int(sys.argv[2]) if len(sys.argv) > 2 else 800

cfg = DETECTOR_PRESETS["config_1"].config
model = GeneralizedRCNN(config=cfg, dtype=jnp.bfloat16)
variables = jax.jit(lambda k: model.init(
    {"params": k, "sampling": jax.random.key(1)},
    jnp.zeros((1, S, S, 3)), train=False,
))(jax.random.key(0))
state = DetTrainState.create(model, variables, build_optimizer("sgd", 1e-3, momentum=0.9))

rng = np.random.default_rng(0)
x0 = rng.uniform(0, S * 0.6, (B, 1))
y0 = rng.uniform(0, S * 0.6, (B, 1))
wh = rng.uniform(S * 0.15, S * 0.35, (B, 2))
batch = {
    "image": jnp.asarray(rng.normal(0, 60, (B, S, S, 3)).astype(np.float32) + 120),
    "gt_boxes": jnp.asarray(
        np.concatenate([x0, y0, x0 + wh[:, :1], y0 + wh[:, 1:]], 1)[:, None, :], jnp.float32
    ),
    "gt_classes": jnp.zeros((B, 1), jnp.int32),
    "gt_valid": jnp.ones((B, 1), bool),
}


def loss_fn(params, key, frozen_backbone=False):
    def apply(p):
        return model.apply(
            {"params": p}, batch["image"], gt_boxes=batch["gt_boxes"],
            gt_classes=batch["gt_classes"], gt_valid=batch["gt_valid"],
            train=True, rngs={"sampling": key},
        )

    if frozen_backbone:
        # stop grads INTO the backbone by treating its params as consts
        bb = {k: jax.lax.stop_gradient(v) for k, v in params.items()
              if k in ("backbone", "fpn")}
        rest = {k: v for k, v in params.items() if k not in ("backbone", "fpn")}
        losses = apply({**bb, **rest})
    else:
        losses = apply(params)
    return losses["loss_total"]


def mk(kind):
    @partial(jax.jit, static_argnames="n")
    def repeat(n, params, opt_state):
        def body(carry, i):
            p, o, acc = carry
            key = jax.random.fold_in(jax.random.key(0), i)
            if kind == "fwd":
                l = loss_fn(p, key)
                p = jax.tree_util.tree_map(lambda a: a + (l * 1e-20).astype(a.dtype), p)
                return (p, o, acc + l), None
            l, g = jax.value_and_grad(
                lambda q: loss_fn(q, key, frozen_backbone=(kind == "bb_frozen"))
            )(p)
            if kind == "full":
                import optax

                up, o = state.tx.update(g, o, p)
                p = optax.apply_updates(p, up)
            else:
                p = jax.tree_util.tree_map(
                    lambda a, b: a + (b * 1e-20).astype(a.dtype), p, g
                )
            return (p, o, acc + l), None

        (p, o, acc), _ = jax.lax.scan(body, (params, opt_state, jnp.float32(0)), jnp.arange(n))
        return acc

    return repeat


def flops_of(exe):
    try:
        ca = exe.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def mem_of(exe):
    """Peak temp-allocation estimate (bytes) — tells whether the step is
    anywhere near the 16 GB HBM spill regime (remat would only matter
    there)."""
    try:
        ma = exe.memory_analysis()
        return int(getattr(ma, "temp_size_in_bytes", 0)), int(
            getattr(ma, "argument_size_in_bytes", 0)
        )
    except Exception:
        return 0, 0


for kind in ("fwd", "bb_frozen", "full"):
    rep = mk(kind)
    t0 = time.time()
    lo = rep.lower(1, state.params, state.opt_state).compile()
    hi = rep.lower(4, state.params, state.opt_state).compile()
    print(f"[{kind}] compiled in {time.time()-t0:.0f}s", flush=True)

    def timed(e):
        t0 = time.perf_counter()
        float(e(state.params, state.opt_state))
        return time.perf_counter() - t0

    timed(lo); timed(hi)
    t1 = min(timed(lo) for _ in range(3))
    t4 = min(timed(hi) for _ in range(3))
    dt = (t4 - t1) / 3
    fl = flops_of(hi)
    tmp, arg = mem_of(hi)
    print(f"[{kind}] {dt*1e3:.1f} ms/step  {B/dt:.1f} im/s  "
          f"{fl/1e12:.2f} TF/step  {fl/dt/1e12:.1f} TF/s  "
          f"temp {tmp/2**30:.2f} GiB  args {arg/2**30:.2f} GiB", flush=True)
