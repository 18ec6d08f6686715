#!/usr/bin/env python
"""Throughput benchmarks: data loader / train step / eval step
(detectron2 tools/benchmark.py:69-134 equivalent).

Device timings use the scan-marginal methodology (see bench.py): this
TPU backend is asynchronous, so we loop the step inside one dispatch and
report the marginal cost between two loop lengths.
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spacecraft_pose_estimation_tpu.utils import maybe_force_platform

maybe_force_platform()


def benchmark_data(args):
    import numpy as np

    from spacecraft_pose_estimation_tpu.data.landmark_dataset import (
        LandmarkExamples,
        batch_iterator,
    )

    examples = LandmarkExamples(args.train_json, args.image_dir)
    it = batch_iterator(examples, args.batch_size, seed=0)
    next(it)  # warm
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        next(it)
    dt = time.perf_counter() - t0
    print(f"data loader: {n * args.batch_size / dt:.1f} images/s")


def benchmark_train(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spacecraft_pose_estimation_tpu.models import build_landmark_model
    from spacecraft_pose_estimation_tpu.ops import heatmap as hm_ops
    from spacecraft_pose_estimation_tpu.train.optim import build_optimizer
    from spacecraft_pose_estimation_tpu.train.state import TrainState, make_train_step

    model = build_landmark_model(args.model, args.num_joints, dtype=jnp.bfloat16)
    size = args.input_size
    hm_size = size // 4
    variables = model.init(jax.random.key(0), jnp.zeros((1, size, size, 3)), train=True)
    state = TrainState.create(model, variables, build_optimizer("adam", 1e-3))
    rng = np.random.default_rng(0)
    b = args.batch_size
    joints = rng.uniform(0, size, (b, args.num_joints, 2)).astype(np.float32)
    tgt, tw = jax.vmap(
        lambda j: hm_ops.generate_target(j, jnp.ones(args.num_joints), (size, size), (hm_size, hm_size), 2.0)
    )(jnp.asarray(joints))
    batch = {
        "image": jnp.asarray(rng.normal(size=(b, size, size, 3)).astype(np.float32)),
        "target": tgt,
        "target_weight": tw,
    }
    step = make_train_step()

    @partial(jax.jit, static_argnames="n")
    def repeat(n, state, batch):
        def body(st, _):
            st, m = step(st, batch)
            return st, m["loss"]

        st, losses = jax.lax.scan(body, state, None, length=n)
        return losses[-1]

    def timed(n):
        t0 = time.perf_counter()
        float(repeat(n, state, batch))
        return time.perf_counter() - t0

    timed(2)
    timed(8)
    t2 = min(timed(2) for _ in range(3))
    t8 = min(timed(8) for _ in range(3))
    dt = (t8 - t2) / 6
    print(f"train step ({args.model} {size}^2 b{b}): "
          f"{dt * 1e3:.1f} ms/step, {b / dt:.1f} images/s")


def benchmark_train_det(args):
    """Detector train-step throughput (the BASELINE row's counterpart:
    Faster R-CNN X101-FPN 3x trains at 0.638 s/iter at batch 16 on
    8x V100, MODEL_ZOO.md:192-199 — i.e. 25.1 images/s cluster-wide)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spacecraft_pose_estimation_tpu.models.rcnn import GeneralizedRCNN
    from spacecraft_pose_estimation_tpu.models.zoo import DETECTOR_PRESETS
    from spacecraft_pose_estimation_tpu.train.detection_state import (
        DetTrainState,
        make_detection_train_step,
    )
    from spacecraft_pose_estimation_tpu.train.optim import build_optimizer

    cfg = DETECTOR_PRESETS[args.model].config if args.model in DETECTOR_PRESETS \
        else getattr(__import__(
            "spacecraft_pose_estimation_tpu.models.rcnn", fromlist=[args.model]
        ), args.model)
    size, b = args.input_size, args.batch_size
    model = GeneralizedRCNN(config=cfg, dtype=jnp.bfloat16)
    variables = jax.jit(lambda k: model.init(
        {"params": k, "sampling": jax.random.key(1)},
        jnp.zeros((1, size, size, 3)), train=False,
    ))(jax.random.key(0))
    state = DetTrainState.create(
        model, variables, build_optimizer("sgd", 1e-3, momentum=0.9)
    )
    rng = np.random.default_rng(0)
    # one box per image spread over the frame (the spacecraft contract)
    x0 = rng.uniform(0, size * 0.6, (b, 1))
    y0 = rng.uniform(0, size * 0.6, (b, 1))
    wh = rng.uniform(size * 0.15, size * 0.35, (b, 2))
    batch = {
        "image": jnp.asarray(rng.normal(0, 60, (b, size, size, 3)).astype(np.float32) + 120),
        "gt_boxes": jnp.asarray(
            np.concatenate([x0, y0, x0 + wh[:, :1], y0 + wh[:, 1:]], 1)[:, None, :],
            jnp.float32,
        ),
        "gt_classes": jnp.zeros((b, 1), jnp.int32),
        "gt_valid": jnp.ones((b, 1), bool),
    }
    step = make_detection_train_step()

    @partial(jax.jit, static_argnames="n")
    def repeat(n, state, batch):
        def body(carry, i):
            st, _ = carry
            st, m = step(st, batch, jax.random.fold_in(jax.random.key(0), i))
            return (st, m["loss_total"]), None

        (st, loss), _ = jax.lax.scan(body, (state, jnp.float32(0)), jnp.arange(n))
        return loss

    def timed(n):
        t0 = time.perf_counter()
        float(repeat(n, state, batch))
        return time.perf_counter() - t0

    timed(1)
    timed(4)
    t1 = min(timed(1) for _ in range(3))
    t4 = min(timed(4) for _ in range(3))
    dt = (t4 - t1) / 3
    print(f"detector train step ({args.model} {size}^2 b{b}): "
          f"{dt * 1e3:.1f} ms/step ({dt:.3f} s/iter), {b / dt:.1f} images/s")


def benchmark_eval(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spacecraft_pose_estimation_tpu.models import build_landmark_model

    model = build_landmark_model(args.model, args.num_joints, dtype=jnp.bfloat16)
    size = args.input_size
    variables = model.init(jax.random.key(0), jnp.zeros((1, size, size, 3)), train=False)
    b = args.batch_size
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(b, size, size, 3)).astype(np.float32)
    )

    @partial(jax.jit, static_argnames="n")
    def repeat(n, v, x):
        def body(c, _):
            return c + jnp.sum(model.apply(v, x + c * 1e-20, train=False)) * 1e-20, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return c

    def timed(n):
        t0 = time.perf_counter()
        float(repeat(n, variables, x))
        return time.perf_counter() - t0

    timed(2)
    timed(10)
    t2 = min(timed(2) for _ in range(3))
    t10 = min(timed(10) for _ in range(3))
    dt = (t10 - t2) / 8
    print(f"eval step ({args.model} {size}^2 b{b}): "
          f"{dt * 1e3:.1f} ms/step, {b / dt:.1f} images/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", choices=["data", "train", "train-det", "eval"],
                    required=True)
    ap.add_argument("--train-json")
    ap.add_argument("--image-dir")
    ap.add_argument("--model", default="pose_hrnet")
    ap.add_argument("--num-joints", type=int, default=11)
    ap.add_argument("--input-size", type=int, default=512)
    ap.add_argument("--batch-size", type=int, default=32)
    args = ap.parse_args()
    {"data": benchmark_data, "train": benchmark_train,
     "train-det": benchmark_train_det, "eval": benchmark_eval}[args.task](args)


if __name__ == "__main__":
    main()
