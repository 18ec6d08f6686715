"""Detector train-step decomposition + levers (VERDICT r4 #6), queue
style: compile all variants on parallel threads, measure when
/tmp/go_trainstep exists.

Baseline (r3s5): config_1 X101-FPN 800^2 b16 = 764.7 ms/step on one
v5e vs the zoo's 0.638 s/iter on 8xV100
(object_detection/detectron2/MODEL_ZOO.md:192-199).

Variants:
  fwd        loss forward only (no grad) — the fwd/bwd split
  full       value_and_grad + sgd(momentum) update — the real step
  bb_frozen  stop_gradient into backbone+fpn — isolates their backward
  gw64/gw256 full step with MergedGroupConv packing width 64/256 (the
             FLOP-vs-lane-utilization knob: merged FLOPs scale with
             m = width/cgi, utilization rises with width)

Usage: python devbench/r5_trainstep_queue.py [batch] [size]
"""

import dataclasses
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.models.rcnn import GeneralizedRCNN
from spacecraft_pose_estimation_tpu.models.zoo import DETECTOR_PRESETS
from spacecraft_pose_estimation_tpu.train.optim import build_optimizer

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
S = int(sys.argv[2]) if len(sys.argv) > 2 else 800
N_LO, N_HI = 1, 4
GO_FILE = "/tmp/go_trainstep"
T0 = time.time()


def log(msg):
    print(f"[r5t t+{time.time()-T0:.0f}s] {msg}", flush=True)


base_cfg = DETECTOR_PRESETS["config_1"].config

rng = np.random.default_rng(0)
x0 = rng.uniform(0, S * 0.6, (B, 1))
y0 = rng.uniform(0, S * 0.6, (B, 1))
wh = rng.uniform(S * 0.15, S * 0.35, (B, 2))
batch = {
    "image": jnp.asarray(rng.normal(0, 60, (B, S, S, 3)).astype(np.float32) + 120),
    "gt_boxes": jnp.asarray(
        np.concatenate([x0, y0, x0 + wh[:, :1], y0 + wh[:, 1:]], 1)[:, None, :],
        jnp.float32,
    ),
    "gt_classes": jnp.zeros((B, 1), jnp.int32),
    "gt_valid": jnp.ones((B, 1), bool),
}

tx = build_optimizer("sgd", 1e-3, momentum=0.9)


def make_variant(gw: int, kind: str):
    cfg = dataclasses.replace(
        base_cfg, backbone=dataclasses.replace(base_cfg.backbone, merged_group_width=gw)
    )
    model = GeneralizedRCNN(config=cfg, dtype=jnp.bfloat16)
    variables = jax.jit(lambda k: model.init(
        {"params": k, "sampling": jax.random.key(1)},
        jnp.zeros((1, S, S, 3)), train=False,
    ))(jax.random.key(0))
    params = variables["params"]
    opt_state = tx.init(params)

    def loss_fn(p, key):
        if kind == "bb_frozen":
            p = {
                k: (jax.tree_util.tree_map(jax.lax.stop_gradient, v)
                    if k in ("backbone", "fpn") else v)
                for k, v in p.items()
            }
        losses = model.apply(
            {"params": p}, batch["image"], gt_boxes=batch["gt_boxes"],
            gt_classes=batch["gt_classes"], gt_valid=batch["gt_valid"],
            train=True, rngs={"sampling": key},
        )
        return losses["loss_total"]

    @jax.jit
    def repeat(params, opt_state, n):
        def body(i, carry):
            p, o, acc = carry
            key = jax.random.fold_in(jax.random.key(0), i + (acc * 1e-20).astype(jnp.int32))
            if kind == "fwd":
                l = loss_fn(p, key)
                return (p, o, acc + l * 1e-20)
            l, g = jax.value_and_grad(loss_fn)(p, key)
            upd, o2 = tx.update(g, o, p)
            import optax

            p2 = optax.apply_updates(p, upd)
            return (p2, o2, acc + l * 1e-20)

        _, _, acc = jax.lax.fori_loop(0, n, body, (params, opt_state, jnp.float32(0.0)))
        return acc

    return repeat, (params, opt_state)


VARIANTS = [
    ("fwd gw128", 128, "fwd"),
    ("full gw128 (baseline)", 128, "full"),
    ("bb_frozen gw128", 128, "bb_frozen"),
    ("full gw64", 64, "full"),
    ("full gw256", 256, "full"),
]
# R5T_ONLY=<substring>: build/measure just the matching variants — the
# all-at-once run died RESOURCE_EXHAUSTED at measure time (4 resident
# X101 param/momentum sets + the b16 800^2 backward's temp memory
# exceed the 16 GB chip). One variant per process is the safe shape.
_only = os.environ.get("R5T_ONLY")
if _only:
    VARIANTS = [v for v in VARIANTS if _only in v[0]]

exes = {}
args_of = {}
errs = {}


def compile_one(name, gw, kind):
    try:
        t0 = time.time()
        rep, args = make_variant(gw, kind)
        args_of[name] = args
        exes[name] = rep.lower(*args, jnp.asarray(0, jnp.int32)).compile()
        log(f"{name}: compiled in {time.time()-t0:.0f}s")
    except Exception as e:
        errs[name] = f"{type(e).__name__}: {e}"[:300]
        log(f"{name}: FAILED {errs[name]}")


threads = [
    threading.Thread(target=compile_one, args=v, daemon=True) for v in VARIANTS
]
log(f"compiling {len(threads)} variants on parallel threads (b{B} {S}^2)")
for t in threads:
    t.start()
for t in threads:
    t.join()
log(f"compiles done ({len(exes)} ok, {len(errs)} failed)")

log(f"waiting for {GO_FILE}")
while not os.path.exists(GO_FILE):
    time.sleep(15)
log("GO — measuring serially")

for name, _gw, _kind in VARIANTS:
    if name not in exes:
        continue
    e, args = exes[name], args_of[name]

    def timed(n):
        t0 = time.perf_counter()
        float(e(*args, jnp.asarray(n, jnp.int32)))
        return time.perf_counter() - t0

    timed(N_LO)
    timed(N_HI)
    t_lo = min(timed(N_LO) for _ in range(3))
    t_hi = min(timed(N_HI) for _ in range(3))
    dt = max((t_hi - t_lo) / (N_HI - N_LO), 1e-9)
    log(f"{name}: {dt*1e3:.1f} ms/step  ({B/dt:.1f} im/s)")
