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
    ap.add_argument("--task", choices=["data", "train", "eval"], required=True)
    ap.add_argument("--train-json")
    ap.add_argument("--image-dir")
    ap.add_argument("--model", default="pose_hrnet")
    ap.add_argument("--num-joints", type=int, default=11)
    ap.add_argument("--input-size", type=int, default=512)
    ap.add_argument("--batch-size", type=int, default=32)
    args = ap.parse_args()
    {"data": benchmark_data, "train": benchmark_train, "eval": benchmark_eval}[args.task](args)


if __name__ == "__main__":
    main()
