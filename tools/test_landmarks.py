#!/usr/bin/env python
"""Evaluate a landmark model -> pred.mat (tools/test.py equivalent).

Also supports k-model ensembles via --ensemble (test_cv_ensemble.py):
heatmaps are averaged over the stacked checkpoints before decoding.
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spacecraft_pose_estimation_tpu.utils import maybe_force_platform

maybe_force_platform()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="events")
    ap.add_argument("--cfg", default=None)
    ap.add_argument("--test-json", required=True)
    ap.add_argument("--image-dir", required=True)
    ap.add_argument("--checkpoint", required=True, nargs="+",
                    help="checkpoint dir(s); >1 = ensemble")
    ap.add_argument("--output", default="output")
    ap.add_argument("--pred-name", default="pred_test")
    ap.add_argument("opts", nargs="*")
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from spacecraft_pose_estimation_tpu import config as C
    from spacecraft_pose_estimation_tpu.data import coco_io
    from spacecraft_pose_estimation_tpu.data.landmark_dataset import LandmarkExamples
    from spacecraft_pose_estimation_tpu.models import build_landmark_model
    from spacecraft_pose_estimation_tpu.train import landmark_loop
    from spacecraft_pose_estimation_tpu.train.checkpoint import CheckpointManager
    from spacecraft_pose_estimation_tpu.train.ensemble import (
        make_ensemble_apply,
        stack_variables,
    )
    from spacecraft_pose_estimation_tpu.train.optim import build_optimizer
    from spacecraft_pose_estimation_tpu.train.state import TrainState

    cfg = C.get_preset(args.preset)
    if args.cfg:
        cfg = C.load_yaml(cfg, args.cfg)
    cfg = C.apply_overrides(cfg, args.opts)

    examples = LandmarkExamples(args.test_json, args.image_dir)
    dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
    model = build_landmark_model(cfg.model.name, examples.num_joints, dtype=dtype)
    img_w, img_h = cfg.model.image_size
    template = model.init(jax.random.key(0), jnp.zeros((1, img_h, img_w, 3)), train=False)

    def load(ckpt_dir):
        mgr = CheckpointManager(ckpt_dir)
        st = TrainState.create(model, template, build_optimizer("adam", 1e-3))
        restored = mgr.restore(st)
        if restored is None:
            raise FileNotFoundError(f"no checkpoint in {ckpt_dir}")
        st = restored[0]
        return {"params": st.params, "batch_stats": st.batch_stats}

    variables_list = [load(c) for c in args.checkpoint]

    if len(variables_list) == 1:
        preds = landmark_loop.validate(
            model, variables_list[0], examples, cfg.test.batch_size_per_chip,
            tuple(cfg.model.image_size),
            output_path=os.path.join(args.output, f"{args.pred_name}.mat"),
            flip_test=cfg.test.flip_test,
            post_process=cfg.test.post_process,
            shift_heatmap=cfg.test.shift_heatmap,
        )
    else:
        # ensemble path: average heatmaps then decode
        from spacecraft_pose_estimation_tpu.ops import heatmap as hm_ops
        from spacecraft_pose_estimation_tpu.ops.geometry import bbox_to_center_scale
        from spacecraft_pose_estimation_tpu.ops.warp import batched_crop_and_resize
        from spacecraft_pose_estimation_tpu.pipeline import normalize_crops

        stacked = stack_variables(variables_list)
        ens = jax.jit(make_ensemble_apply(model))
        bsz = cfg.test.batch_size_per_chip
        n = len(examples)
        preds = np.zeros((n, examples.num_joints, 3), np.float32)
        for start in range(0, n, bsz):
            idx = list(range(start, min(start + bsz, n)))
            pad = bsz - len(idx)
            exs = [examples.example(i) for i in idx]
            images = np.stack([e["image"] for e in exs] + [exs[-1]["image"]] * pad)
            bboxes = np.stack([e["bbox"] for e in exs] + [exs[-1]["bbox"]] * pad)
            centers, scales = jax.vmap(bbox_to_center_scale)(jnp.asarray(bboxes))
            crops = batched_crop_and_resize(
                jnp.asarray(images), centers, scales, jnp.zeros(bsz),
                tuple(cfg.model.image_size), method="mxu",
            )
            hm = ens(stacked, normalize_crops(crops))
            p, mv = hm_ops.decode_heatmaps(hm, centers, scales, cfg.test.post_process)
            preds[start : start + len(idx), :, :2] = np.asarray(p)[: len(idx)]
            preds[start : start + len(idx), :, 2] = np.asarray(mv)[: len(idx)]
        coco_io.save_pred_mat(preds, os.path.join(args.output, f"{args.pred_name}.mat"))

    print(f"wrote {args.output}/{args.pred_name}.mat preds shape {preds.shape}")

    # keypoint-OKS AP vs GT when the json carries labeled keypoints
    # (dummy all-(2,2,2) real_test.json boxes give no signal -> skip)
    joints = np.stack([examples.example(i)["joints"] for i in range(len(examples))])
    if len(joints) and not np.allclose(joints[..., :2], 2.0):
        res = landmark_loop.oks_metrics(preds, examples)
        print(
            "keypoint OKS AP {AP:.2f} AP50 {AP50:.2f} AP75 {AP75:.2f}".format(**res)
        )


if __name__ == "__main__":
    main()
