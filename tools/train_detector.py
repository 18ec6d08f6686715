#!/usr/bin/env python
"""Train the spacecraft detector (train_object_detection.py equivalent).

Builds the X101-FPN Faster R-CNN (config_4 semantics) or RetinaNet, the
detectron2-style SGD multistep+warmup schedule, and runs the hook-driven
trainer with periodic COCO evaluation (COCOEvaluator with
max_dets_per_image=1, matching train_object_detection.py:56).
"""

import argparse
import itertools
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spacecraft_pose_estimation_tpu.utils import maybe_force_platform

maybe_force_platform()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-json", required=True)
    ap.add_argument("--val-json", default=None)
    ap.add_argument("--image-dir", required=True)
    ap.add_argument("--output", default="output/detector")
    ap.add_argument("--preset", default=None,
                    help="reference registry config name (train_object_detection.py "
                         "--config / object_detection_utils.py config_N): sets the "
                         "model, input size, flip, and the exact SOLVER schedule "
                         "(max_iter/lr/batch/warmup/steps/gamma/periods); any "
                         "explicit flag below overrides its field. config_4 pins "
                         "input size to the frame height — pass --input-size.")
    ap.add_argument("--arch", choices=["faster_rcnn", "retinanet"], default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--input-size", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--max-iter", type=int, default=None)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--eval-period", type=int, default=None)
    ap.add_argument("--checkpoint-period", type=int, default=None)
    ap.add_argument("--flip", action="store_true",
                    help="horizontal RandomFlip p=0.5 (config_1-style; the "
                         "flagship config_4 sets INPUT.RANDOM_FLIP='none')")
    ap.add_argument("--photometric-augs", choices=["none", "event", "speedplus"],
                    default="none",
                    help="device-side visual aug stack (fork augmentations)")
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO)
    logger = logging.getLogger("train_detector")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from spacecraft_pose_estimation_tpu.data.coco_eval import (
        evaluate_detections,
        padded_detections_to_list,
    )
    from spacecraft_pose_estimation_tpu.data.detection_dataset import (
        DetectionExamples,
        detection_batches,
        letterbox,
    )
    from spacecraft_pose_estimation_tpu.models.rcnn import (
        FASTER_RCNN_X101_SPACECRAFT,
        RCNN_TINY,
        GeneralizedRCNN,
    )
    from spacecraft_pose_estimation_tpu.models.retinanet import (
        RETINANET_TINY,
        RetinaNet,
        RetinaNetConfig,
    )
    from spacecraft_pose_estimation_tpu.train.checkpoint import CheckpointManager
    from spacecraft_pose_estimation_tpu.train.detection_state import (
        DetTrainState,
        make_detection_train_step,
    )
    from spacecraft_pose_estimation_tpu.train.metrics import JSONWriter, MetricStorage, TerminalPrinter
    from spacecraft_pose_estimation_tpu.train.optim import build_optimizer, multistep_schedule
    from spacecraft_pose_estimation_tpu.train.trainer import (
        IterationTimer,
        PeriodicCheckpointer,
        PeriodicWriter,
        Trainer,
    )

    # resolve preset-vs-flag defaults: a named preset supplies every
    # unset field; without one, the round-1 standalone defaults apply
    preset = solver = None
    if args.preset:
        from spacecraft_pose_estimation_tpu.models.zoo import get_detector_preset

        preset = get_detector_preset(args.preset, image_height=args.input_size)
        solver = preset.solver
    if args.arch is None:
        args.arch = preset.arch if preset else "faster_rcnn"
    elif preset and args.arch != preset.arch:
        ap.error(f"--arch {args.arch} conflicts with --preset {args.preset} "
                 f"({preset.arch}); drop one of the flags")
    if args.input_size is None:
        args.input_size = preset.input_size if preset else 768
    if args.batch_size is None:
        args.batch_size = solver.ims_per_batch if solver else 4
    if args.max_iter is None:
        args.max_iter = solver.max_iter if solver else 6000
    if args.lr is None:
        args.lr = solver.base_lr if solver else 0.00025
    if args.eval_period is None:
        args.eval_period = solver.eval_period if solver else 1000
    if args.checkpoint_period is None:
        args.checkpoint_period = solver.checkpoint_period if solver else 1000
    if preset and not args.flip:
        args.flip = preset.flip

    size = args.input_size
    if args.arch == "faster_rcnn":
        cfg = FASTER_RCNN_X101_SPACECRAFT if preset is None else preset.config
        model = GeneralizedRCNN(
            config=RCNN_TINY if args.tiny else cfg,
            dtype=jnp.bfloat16,
        )
        needs_rng = True
        init_rngs = {"params": jax.random.key(0), "sampling": jax.random.key(1)}
    else:
        cfg = RetinaNetConfig(num_classes=1) if preset is None else preset.config
        model = RetinaNet(
            config=RETINANET_TINY if args.tiny else cfg,
            dtype=jnp.bfloat16,
        )
        needs_rng = False
        init_rngs = {"params": jax.random.key(0)}

    variables = model.init(init_rngs, jnp.zeros((1, size, size, 3)), train=False)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    logger.info("model params: %.2fM", n_params / 1e6)

    if solver is not None:
        # the reference registry's exact schedule for this config
        milestones = [s for s in solver.steps if s < args.max_iter]
        gamma, warmup = solver.gamma, solver.warmup_iters
    else:
        # detectron2 3x-style schedule scaled to max_iter
        milestones = [int(args.max_iter * 0.67), int(args.max_iter * 0.89)]
        gamma, warmup = 0.1, min(1000, args.max_iter // 10)
    tx = build_optimizer(
        "sgd",
        multistep_schedule(args.lr, milestones, gamma, warmup_steps=warmup),
        weight_decay=1e-4,
        momentum=0.9,
        grad_clip_norm=None,
    )
    state = DetTrainState.create(model, variables, tx)
    mgr = CheckpointManager(os.path.join(args.output, "checkpoints"))
    restored = mgr.restore(state)
    start_iter = 0
    if restored:
        state, _, start_iter = restored
        logger.info("resumed at iter %d", start_iter)

    examples = DetectionExamples(args.train_json, args.image_dir)
    data = detection_batches(
        examples, args.batch_size, (size, size), train=True, flip=args.flip,
        process_index=jax.process_index(), process_count=jax.process_count(),
    )

    raw_step = jax.jit(
        make_detection_train_step(
            needs_rng, ema_loss_normalizer=(args.arch == "retinanet")
        )
    )
    base_key = jax.random.key(42)

    aug_fn = None
    if args.photometric_augs != "none":
        from spacecraft_pose_estimation_tpu.data import augment as A

        stack = A.EVENT_STACK if args.photometric_augs == "event" else A.SPEEDPLUS_STACK
        aug_fn = jax.jit(
            jax.vmap(lambda k, im: A.apply_stack(k, im, stack))
        )

    def step_fn(state, batch):
        key = jax.random.fold_in(base_key, int(state.step))
        jb = {k: jnp.asarray(v) for k, v in batch.items() if k not in ("image_id", "scale", "count")}
        if aug_fn is not None:
            keys = jax.random.split(jax.random.fold_in(key, 1), jb["image"].shape[0])
            jb["image"] = aug_fn(keys, jb["image"])
        return raw_step(state, jb, key)

    storage = MetricStorage()
    hooks = [
        IterationTimer(),
        PeriodicWriter(
            [JSONWriter(os.path.join(args.output, "metrics.json")), TerminalPrinter(args.max_iter)],
            period=20,
        ),
        PeriodicCheckpointer(mgr, args.checkpoint_period),
    ]

    trainer = Trainer(step_fn, state, data, hooks, storage)

    if args.val_json:
        val_examples = DetectionExamples(args.val_json, args.image_dir)
        infer = jax.jit(lambda v, x: model.apply(v, x, train=False))

        def run_eval(tr):
            dets_all, gts_all = [], []
            for batch in detection_batches(
                val_examples, args.batch_size, (size, size), train=False, augment=False
            ):
                dets = infer({"params": tr.state.params}, jnp.asarray(batch["image"]))
                dets = jax.tree_util.tree_map(np.asarray, dets)
                count = batch.get("count", len(batch["image_id"]))
                dets_all.extend(padded_detections_to_list(dets)[:count])
                for i in range(count):
                    gts_all.append({"boxes": batch["gt_boxes"][i][batch["gt_valid"][i]]})
            res = evaluate_detections(dets_all, gts_all, max_dets=1)
            logger.info("eval: %s", res)
            return {f"bbox/{k}": v for k, v in res.items() if np.isfinite(v)}

        from spacecraft_pose_estimation_tpu.train.trainer import EvalHook

        trainer.hooks.append(EvalHook(args.eval_period, run_eval))

    trainer.train(start_iter, args.max_iter)
    mgr.save(trainer.iteration, trainer.state, {"final": True})
    logger.info("done")


if __name__ == "__main__":
    main()
