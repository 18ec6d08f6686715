#!/usr/bin/env python
"""Single-image landmark + pose demo (landmark_regression/demo parity).

Given an image, a bounding box (or a detector checkpoint to find one),
runs the fused crop->HRNet->decode->PnP path and writes a visualization.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spacecraft_pose_estimation_tpu.utils import maybe_force_platform

maybe_force_platform()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", required=True)
    ap.add_argument("--box", type=float, nargs=4, default=None,
                    help="x y w h (omit to use the full frame)")
    ap.add_argument("--checkpoint", required=True, help="landmark ckpt dir")
    ap.add_argument("--model", default="pose_hrnet")
    ap.add_argument("--image-size", type=int, nargs=2, default=[512, 512])
    ap.add_argument("--landmarks-file", default=None)
    ap.add_argument("--calibration-file", default=None)
    ap.add_argument("--output", default="demo_out.jpg")
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spacecraft_pose_estimation_tpu.data import coco_io
    from spacecraft_pose_estimation_tpu.models import build_landmark_model
    from spacecraft_pose_estimation_tpu.pipeline import (
        PipelineConfig,
        make_landmark_stage,
        make_pose_pipeline,
    )
    from spacecraft_pose_estimation_tpu.train.checkpoint import CheckpointManager
    from spacecraft_pose_estimation_tpu.train.optim import build_optimizer
    from spacecraft_pose_estimation_tpu.train.state import TrainState

    img = cv2.imread(args.image, cv2.IMREAD_COLOR)
    rgb = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32)
    h, w = rgb.shape[:2]
    box = args.box or [0.0, 0.0, float(w), float(h)]

    lm3d = coco_io.load_landmarks_csv(args.landmarks_file) if args.landmarks_file else None
    num_joints = lm3d.shape[0] if lm3d is not None else 11

    model = build_landmark_model(args.model, num_joints, dtype=jnp.bfloat16)
    iw, ih = args.image_size
    template = model.init(jax.random.key(0), jnp.zeros((1, ih, iw, 3)), train=False)
    mgr = CheckpointManager(args.checkpoint)
    st = TrainState.create(model, template, build_optimizer("adam", 1e-3))
    restored = mgr.restore(st)
    if restored is None:
        raise FileNotFoundError(args.checkpoint)
    variables = {"params": restored[0].params, "batch_stats": restored[0].batch_stats}

    cfg = PipelineConfig(image_size=(iw, ih), solver="none")
    frames = jnp.asarray(rgb[None])
    boxes = jnp.asarray([box], jnp.float32)

    if lm3d is not None and args.calibration_file:
        from spacecraft_pose_estimation_tpu.data.camera import CameraModel

        cam = CameraModel.from_calibration_json(args.calibration_file, w, h)
        run = make_pose_pipeline(
            model, lm3d.astype(np.float32), cam.K.astype(np.float32),
            cam.dist.astype(np.float32),
            PipelineConfig(image_size=(iw, ih), solver="ransac"),
        )
        out = run(variables, frames, boxes, jax.random.key(0))
        R, t = np.asarray(out["R"][0]), np.asarray(out["t"][0])
        print("R=\n", R, "\nt=", t)
        uv = coco_io.project_landmarks(lm3d, R, t, cam.K, cam.dist)
        for x, y in uv:
            cv2.circle(img, (int(x), int(y)), 5, (255, 0, 0), -1)
    else:
        stage = make_landmark_stage(model, cfg)
        out = stage(variables, frames, boxes)

    kps = np.asarray(out["keypoints"][0])
    conf = np.asarray(out["confidence"][0])
    for (x, y), c in zip(kps, conf):
        color = (0, 255, 0) if c > 0.5 else (0, 165, 255)
        cv2.circle(img, (int(x), int(y)), 3, color, -1)
    x0, y0, bw, bh = [int(v) for v in box]
    cv2.rectangle(img, (x0, y0), (x0 + bw, y0 + bh), (0, 255, 0), 2)
    cv2.imwrite(args.output, img)
    print(f"wrote {args.output}; mean confidence {conf.mean():.3f}")


if __name__ == "__main__":
    main()
