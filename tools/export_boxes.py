#!/usr/bin/env python
"""Run the detector over frames -> real_test.json
(export_object_detection_bounding_boxes.py equivalent).

Per image: batched jitted inference, argmax-score box (full-frame
fallback when nothing detected), debug overlays bucketed by #detections,
COCO re-export with all-visible dummy keypoints.
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
    ap.add_argument("--image-dir", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--image-width", type=int, default=1920)
    ap.add_argument("--image-height", type=int, default=1200)
    ap.add_argument("--input-size", type=int, default=768, help="letterbox size")
    ap.add_argument("--landmarks-count", type=int, default=11)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--tiny", action="store_true", help="use the tiny test config")
    ap.add_argument("--no-debug-images", action="store_true")
    ap.add_argument(
        "--dtype", choices=["bfloat16", "float32"], default="bfloat16",
        help="compute dtype (float32 for bit-tight golden-parity runs)",
    )
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO)

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spacecraft_pose_estimation_tpu.data import coco_io
    from spacecraft_pose_estimation_tpu.data.detection_dataset import letterbox
    from spacecraft_pose_estimation_tpu.models.rcnn import (
        FASTER_RCNN_X101_SPACECRAFT,
        RCNN_TINY,
        GeneralizedRCNN,
    )
    from spacecraft_pose_estimation_tpu.train.checkpoint import CheckpointManager
    from spacecraft_pose_estimation_tpu.train.detection_state import DetTrainState
    from spacecraft_pose_estimation_tpu.train.optim import build_optimizer

    model = GeneralizedRCNN(
        config=RCNN_TINY if args.tiny else FASTER_RCNN_X101_SPACECRAFT,
        dtype=jnp.dtype(args.dtype),
    )
    size = args.input_size
    template = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, size, size, 3)), train=False
    )
    mgr = CheckpointManager(args.checkpoint)
    st = DetTrainState.create(model, template, build_optimizer("sgd", 1e-2))
    restored = mgr.restore(st)
    if restored is None:
        raise FileNotFoundError(f"no checkpoint in {args.checkpoint}")
    variables = {"params": restored[0].params}

    infer = jax.jit(lambda imgs: model.apply(variables, imgs, train=False))

    files = sorted(
        f for f in os.listdir(args.image_dir)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))
    )
    for sub in ("0_boxes", "1_boxes", "2_boxes"):
        os.makedirs(os.path.join(args.output_dir, sub), exist_ok=True)

    best_boxes, names = [], []
    for start in range(0, len(files), args.batch_size):
        chunk = files[start : start + args.batch_size]
        imgs, scales = [], []
        for f in chunk:
            im = cv2.imread(os.path.join(args.image_dir, f), cv2.IMREAD_COLOR)
            lb, s = letterbox(im.astype(np.float32), (size, size))
            imgs.append(lb)
            scales.append(s)
        pad = args.batch_size - len(chunk)
        batch = np.stack(imgs + [imgs[-1]] * pad)
        dets = jax.tree_util.tree_map(np.asarray, infer(jnp.asarray(batch)))

        for i, f in enumerate(chunk):
            valid = dets["valid"][i]
            boxes = dets["boxes"][i][valid] / scales[i]
            scores = dets["scores"][i][valid]
            n_det = int(valid.sum())
            if n_det == 0:
                best = coco_io.fallback_full_frame_box(args.image_width, args.image_height)
            else:
                best = boxes[scores.argmax()]
            best_boxes.append(best)
            names.append(f)
            if not args.no_debug_images:
                im = cv2.imread(os.path.join(args.image_dir, f))
                for b, s in zip(boxes, scores):
                    cv2.rectangle(im, (int(b[0]), int(b[1])), (int(b[2]), int(b[3])), (0, 255, 0), 2)
                    cv2.putText(im, f"{s:.2f}", (int(b[0]), int(b[1]) - 4),
                                cv2.FONT_HERSHEY_SIMPLEX, 0.6, (0, 255, 0), 1)
                bucket = f"{min(n_det, 2)}_boxes"
                cv2.imwrite(os.path.join(args.output_dir, bucket, f), im)

    coco = coco_io.detections_to_coco(
        names,
        np.asarray(best_boxes),
        args.landmarks_count,
        args.image_width,
        args.image_height,
    )
    coco_io.save_coco(coco, os.path.join(args.output_dir, "real_test.json"))
    print(f"wrote {args.output_dir}/real_test.json ({len(names)} images)")


if __name__ == "__main__":
    main()
