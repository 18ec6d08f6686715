"""LazyConfig training driver — the d2 ``tools/lazyconfig_train_net.py``
equivalent (reference: detectron2/tools/lazyconfig_train_net.py:1-140,
config/lazy.py:25, instantiate.py:37).

The config is a plain Python file executed in its own namespace that
defines ``LazyCall`` nodes (see ``spacecraft_pose_estimation_tpu.config``):

    from spacecraft_pose_estimation_tpu.config import LazyCall as L
    from spacecraft_pose_estimation_tpu.models.hrnet import HRNet, POSE_HRNET_W32
    import optax

    model = L(HRNet)(config=POSE_HRNET_W32.with_joints(11))
    optimizer = L(optax.adam)(learning_rate=1e-3)
    # optional: dataloader = L(my_loader_factory)(...)   # -> callable(step)->batch
    train = dict(max_iter=40, batch_size=4, image_size=64, heatmap_size=16,
                 num_joints=11, out_dir="output/lazy", log_period=10)

``instantiate`` builds the objects recursively (d2 semantics: any dict
with ``_target_`` becomes a call), then the driver runs the standard
jitted landmark train step. ``KEY VALUE`` command-line pairs override
``train`` entries (d2's ``LazyConfig.apply_overrides`` analogue).

Without a ``dataloader`` node the driver trains on a synthetic
landmark problem (deterministic gaussian-target batches) — enough to
smoke a config end to end, mirroring how the reference driver is
exercised in its own tests.
"""

from __future__ import annotations

import argparse
import ast
import os
import runpy
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spacecraft_pose_estimation_tpu.utils.platform import maybe_force_platform

maybe_force_platform()


def load_lazy_config(path: str) -> dict:
    """Execute the config file and return its namespace (LazyConfig.load)."""
    ns = runpy.run_path(path)
    return {k: v for k, v in ns.items() if not k.startswith("__")}


def apply_overrides(train_cfg: dict, pairs: list[str]) -> dict:
    """``KEY VALUE`` pairs (python literals where possible) onto train."""
    out = dict(train_cfg)
    for key, value in zip(pairs[::2], pairs[1::2]):
        try:
            out[key] = ast.literal_eval(value)
        except (SyntaxError, ValueError):
            out[key] = value
    return out


def synthetic_loader(train_cfg: dict):
    """Deterministic synthetic landmark batches (no dataloader node)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from spacecraft_pose_estimation_tpu.ops.heatmap import generate_target

    size = int(train_cfg.get("image_size", 64))
    hm = int(train_cfg.get("heatmap_size", size // 4))
    bs = int(train_cfg.get("batch_size", 4))
    nj = int(train_cfg.get("num_joints", 11))
    rng = np.random.default_rng(int(train_cfg.get("seed", 0)))
    gen = jax.vmap(
        lambda j, v: generate_target(j, v, (size, size), (hm, hm), 2.0)
    )

    def batch(step: int):
        del step
        imgs = rng.normal(0.0, 1.0, (bs, size, size, 3)).astype(np.float32)
        joints = rng.uniform(size * 0.2, size * 0.8, (bs, nj, 2)).astype(np.float32)
        vis = np.ones((bs, nj), np.float32)
        tgt, tw = gen(jnp.asarray(joints), jnp.asarray(vis))
        return {
            "image": jnp.asarray(imgs),
            "target": tgt,
            "target_weight": tw,
        }

    return batch


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--config-file", required=True)
    ap.add_argument(
        "opts", nargs="*", default=[],
        help="KEY VALUE override pairs for the train dict",
    )
    args = ap.parse_args(argv)

    import jax

    from spacecraft_pose_estimation_tpu.config import instantiate
    from spacecraft_pose_estimation_tpu.train.checkpoint import CheckpointManager
    from spacecraft_pose_estimation_tpu.train.state import (
        TrainState,
        make_train_step,
    )

    ns = load_lazy_config(args.config_file)
    for req in ("model", "optimizer", "train"):
        if req not in ns:
            raise SystemExit(f"config must define a `{req}` node")
    train_cfg = apply_overrides(dict(ns["train"]), args.opts)

    model = instantiate(ns["model"])
    tx = instantiate(ns["optimizer"])
    loader = (
        instantiate(ns["dataloader"])
        if "dataloader" in ns
        else synthetic_loader(train_cfg)
    )

    size = int(train_cfg.get("image_size", 64))
    variables = jax.jit(
        lambda k: model.init(k, jax.numpy.zeros((1, size, size, 3)), train=True)
    )(jax.random.key(int(train_cfg.get("seed", 0))))
    state = TrainState.create(model, variables, tx)
    step_fn = jax.jit(make_train_step())

    max_iter = int(train_cfg.get("max_iter", 40))
    log_period = int(train_cfg.get("log_period", 10))
    out_dir = train_cfg.get("out_dir")
    t0 = time.time()
    metrics = {}
    for it in range(max_iter):
        state, metrics = step_fn(state, loader(it))
        if it % log_period == 0 or it == max_iter - 1:
            print(
                f"iter {it}/{max_iter} loss {float(metrics['loss']):.5f} "
                f"({time.time() - t0:.1f}s)",
                flush=True,
            )
    if out_dir:
        mgr = CheckpointManager(os.path.abspath(out_dir))
        mgr.save(max_iter, state)
        mgr.close()
        print(f"saved checkpoint to {out_dir}", flush=True)
    return float(metrics["loss"]) if metrics else None


if __name__ == "__main__":
    main()
