#!/usr/bin/env python
"""Serialize the fused pipeline as a portable StableHLO artifact
(detectron2 export/ torchscript/ONNX counterpart, the JAX way).

`jax.export` captures the jitted graph + weights call convention into a
self-contained serialized function that any JAX runtime (or IFRT proxy)
can load and run without the Python model code.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spacecraft_pose_estimation_tpu.utils import maybe_force_platform

maybe_force_platform()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True, help="landmark ckpt dir")
    ap.add_argument("--landmarks-file", required=True)
    ap.add_argument("--calibration-file", required=True)
    ap.add_argument("--model", default="pose_hrnet")
    ap.add_argument("--image-size", type=int, nargs=2, default=[512, 512])
    ap.add_argument("--frame-size", type=int, nargs=2, default=[1920, 1200])
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--output", required=True, help="output .stablehlo path")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from spacecraft_pose_estimation_tpu.data import coco_io
    from spacecraft_pose_estimation_tpu.data.camera import CameraModel
    from spacecraft_pose_estimation_tpu.models import build_landmark_model
    from spacecraft_pose_estimation_tpu.pipeline import PipelineConfig, make_pose_pipeline
    from spacecraft_pose_estimation_tpu.train.checkpoint import CheckpointManager
    from spacecraft_pose_estimation_tpu.train.optim import build_optimizer
    from spacecraft_pose_estimation_tpu.train.state import TrainState

    landmarks = coco_io.load_landmarks_csv(args.landmarks_file)
    cam = CameraModel.from_calibration_json(args.calibration_file)
    model = build_landmark_model(args.model, landmarks.shape[0], dtype=jnp.bfloat16)
    w, h = args.image_size
    template = model.init(jax.random.key(0), jnp.zeros((1, h, w, 3)), train=False)
    mgr = CheckpointManager(args.checkpoint)
    st = TrainState.create(model, template, build_optimizer("adam", 1e-3))
    restored = mgr.restore(st)
    if restored is None:
        raise FileNotFoundError(args.checkpoint)
    variables = {"params": restored[0].params, "batch_stats": restored[0].batch_stats}

    run = make_pose_pipeline(
        model, landmarks.astype(np.float32), cam.K.astype(np.float32),
        cam.dist.astype(np.float32),
        PipelineConfig(image_size=(w, h), solver="gn"),
    )

    fw, fh = args.frame_size

    def serving_fn(frames, boxes):
        out = run(variables, frames, boxes)
        return out["keypoints"], out["confidence"], out["R"], out["t"], out["quat"]

    exported = jax.export.export(jax.jit(serving_fn))(
        jax.ShapeDtypeStruct((args.batch_size, fh, fw, 3), jnp.float32),
        jax.ShapeDtypeStruct((args.batch_size, 4), jnp.float32),
    )
    blob = exported.serialize()
    with open(args.output, "wb") as f:
        f.write(blob)
    print(f"exported {len(blob) / 1e6:.1f} MB serving artifact -> {args.output}")


if __name__ == "__main__":
    main()
