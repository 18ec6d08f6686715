#!/usr/bin/env python
"""Full-pipeline evaluation over scenes (evaluate_pipeline.py:9-91).

Two modes:
* --staged: detector export -> landmark test -> PnP export, producing the
  reference's file artifacts per scene (real_test.json, pred.mat,
  opencv_poses.json) — drop-in contract parity.
* default (fused): ONE jitted graph per batch of frames:
  detect -> best-box -> crop -> HRNet -> decode -> PnP — the TPU-native
  replacement for the reference's three chdir+subprocess stages.
"""

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spacecraft_pose_estimation_tpu.utils import maybe_force_platform

maybe_force_platform()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes-dir", required=True, help="dir with per-scene frame folders")
    ap.add_argument("--scenes", nargs="*", default=None)
    ap.add_argument("--landmarks-file", required=True)
    ap.add_argument("--calibration-file", required=True)
    ap.add_argument("--detector-checkpoint", required=True)
    ap.add_argument("--landmark-checkpoint", required=True)
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--preset", default="events")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--input-size", type=int, default=768)
    ap.add_argument(
        "--serving",
        action="store_true",
        help="use the serving detector preset (512/256 proposal budget, "
        "~1.6x faster inference; identical weights/topology)",
    )
    ap.add_argument(
        "--staged",
        action="store_true",
        help="run the three stages as separate processes glued by the file "
        "contract (reference evaluate_pipeline.py:48-91 semantics) instead "
        "of the fused one-graph mode",
    )
    ap.add_argument("opts", nargs="*", help="KEY VALUE config override pairs")
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO)
    logger = logging.getLogger("evaluate_pipeline")

    if args.staged:
        return run_staged(args, logger)

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spacecraft_pose_estimation_tpu import config as C
    from spacecraft_pose_estimation_tpu.data import coco_io
    from spacecraft_pose_estimation_tpu.data.camera import CameraModel
    from spacecraft_pose_estimation_tpu.data.detection_dataset import letterbox
    from spacecraft_pose_estimation_tpu.models import build_landmark_model
    from spacecraft_pose_estimation_tpu.models.rcnn import (
        FASTER_RCNN_X101_SERVING,
        FASTER_RCNN_X101_SPACECRAFT,
        RCNN_TINY,
        GeneralizedRCNN,
        select_best_box,
    )
    from spacecraft_pose_estimation_tpu.pipeline import PipelineConfig, make_pose_pipeline
    from spacecraft_pose_estimation_tpu.train.checkpoint import CheckpointManager
    from spacecraft_pose_estimation_tpu.train.detection_state import DetTrainState
    from spacecraft_pose_estimation_tpu.train.optim import build_optimizer
    from spacecraft_pose_estimation_tpu.train.state import TrainState

    cfg = C.apply_overrides(C.get_preset(args.preset), args.opts)
    cam = CameraModel.from_calibration_json(args.calibration_file)
    landmarks = coco_io.load_landmarks_csv(args.landmarks_file)

    # --- load detector ---
    det_cfg = RCNN_TINY if args.tiny else (
        FASTER_RCNN_X101_SERVING if args.serving else FASTER_RCNN_X101_SPACECRAFT
    )
    det_model = GeneralizedRCNN(config=det_cfg, dtype=jnp.bfloat16)
    size = args.input_size
    det_template = det_model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, size, size, 3)), train=False
    )
    mgr = CheckpointManager(args.detector_checkpoint)
    det_state = DetTrainState.create(det_model, det_template, build_optimizer("sgd", 1e-2))
    restored = mgr.restore(det_state)
    if restored is None:
        raise FileNotFoundError(args.detector_checkpoint)
    det_vars = {"params": restored[0].params}

    # --- load landmark model ---
    lm_model = build_landmark_model(cfg.model.name, landmarks.shape[0], dtype=jnp.bfloat16)
    img_w, img_h = cfg.model.image_size
    lm_template = lm_model.init(jax.random.key(0), jnp.zeros((1, img_h, img_w, 3)), train=False)
    mgr2 = CheckpointManager(args.landmark_checkpoint)
    lm_state = TrainState.create(lm_model, lm_template, build_optimizer("adam", 1e-3))
    restored2 = mgr2.restore(lm_state)
    if restored2 is None:
        raise FileNotFoundError(args.landmark_checkpoint)
    lm_vars = {"params": restored2[0].params, "batch_stats": restored2[0].batch_stats}

    pose_run = make_pose_pipeline(
        lm_model, landmarks.astype(np.float32), cam.K.astype(np.float32),
        cam.dist.astype(np.float32),
        PipelineConfig(image_size=tuple(cfg.model.image_size), solver="ransac"),
    )

    @jax.jit
    def fused(det_vars, lm_vars, letterboxed, frames, scale, key):
        dets = det_model.apply(det_vars, letterboxed, train=False)
        best = select_best_box(dets, (letterboxed.shape[1], letterboxed.shape[2]))
        best = best / scale[:, None]
        boxes_xywh = jnp.stack(
            [best[:, 0], best[:, 1], best[:, 2] - best[:, 0], best[:, 3] - best[:, 1]],
            axis=1,
        )
        out = pose_run(lm_vars, frames, boxes_xywh, key)
        return best, out

    scenes = args.scenes or sorted(
        d for d in os.listdir(args.scenes_dir)
        if os.path.isdir(os.path.join(args.scenes_dir, d))
    )

    for scene in scenes:
        scene_dir = os.path.join(args.scenes_dir, scene)
        out_dir = os.path.join(args.output_dir, scene)
        os.makedirs(out_dir, exist_ok=True)
        files = sorted(
            f for f in os.listdir(scene_dir)
            if f.lower().endswith((".png", ".jpg", ".bmp"))
        )
        if not files:
            logger.warning("scene %s: no frames, skipping", scene)
            continue
        logger.info("scene %s: %d frames", scene, len(files))
        all_preds, all_boxes, names, all_R, all_t = [], [], [], [], []
        bsz = args.batch_size
        for start in range(0, len(files), bsz):
            chunk = files[start : start + bsz]
            frames, lbs, scales = [], [], []
            for f in chunk:
                # the detector trains on BGR (detection_dataset.load uses
                # raw cv2.imread; caffe2 BGR pixel means) — letterbox the
                # BGR frame for it, and flip to RGB only for the landmark
                # crop path (LandmarkExamples color_rgb=True contract)
                im_bgr = cv2.imread(
                    os.path.join(scene_dir, f), cv2.IMREAD_COLOR
                ).astype(np.float32)
                lb, s = letterbox(im_bgr, (size, size))
                frames.append(im_bgr[..., ::-1])
                lbs.append(lb)
                scales.append(s)
            pad = bsz - len(chunk)
            frames_b = np.stack(frames + [frames[-1]] * pad)
            lbs_b = np.stack(lbs + [lbs[-1]] * pad)
            scales_b = np.asarray(scales + [scales[-1]] * pad, np.float32)
            best, out = fused(
                det_vars, lm_vars, jnp.asarray(lbs_b), jnp.asarray(frames_b),
                jnp.asarray(scales_b), jax.random.fold_in(jax.random.key(0), start),
            )
            k = len(chunk)
            names.extend(chunk)
            all_boxes.append(np.asarray(best)[:k])
            kp = np.concatenate(
                [np.asarray(out["keypoints"])[:k], np.asarray(out["confidence"])[:k, :, None]],
                axis=-1,
            )
            all_preds.append(kp)
            all_R.append(np.asarray(out["R"])[:k])
            all_t.append(np.asarray(out["t"])[:k])

        preds = np.concatenate(all_preds)
        boxes = np.concatenate(all_boxes)
        Rs = np.concatenate(all_R)
        ts = np.concatenate(all_t)

        # file-contract artifacts (Appendix, SURVEY.md)
        coco_io.save_pred_mat(preds, os.path.join(out_dir, "pred.mat"))
        coco = coco_io.detections_to_coco(
            names, boxes, landmarks.shape[0],
            int(frames[0].shape[1]), int(frames[0].shape[0]),
            # shared id derivation (coco_io.frame_image_ids) keeps the
            # fused and --staged artifacts byte-consistent
        )
        coco_io.save_coco(coco, os.path.join(out_dir, "real_test.json"))
        coco_io.save_opencv_poses(
            names, Rs, ts, os.path.join(out_dir, "opencv_poses.json")
        )
        logger.info("scene %s done -> %s", scene, out_dir)


def run_staged(args, logger):
    """Stage-by-stage subprocess contract (evaluate_pipeline.py:48-91):
    each stage is an independent process consuming/producing the
    reference's on-disk artifacts, so any stage can be re-run standalone
    (detector -> real_test.json, landmarks -> pred.mat, PnP ->
    opencv_poses.json)."""
    import subprocess

    import cv2
    import numpy as np

    tools_dir = os.path.dirname(os.path.abspath(__file__))

    def run(cmd):
        logger.info("staged: %s", " ".join(cmd))
        r = subprocess.run([sys.executable] + cmd, capture_output=True, text=True)
        if r.returncode != 0:
            raise RuntimeError(
                f"stage failed: {cmd}\nstdout:{r.stdout[-3000:]}\nstderr:{r.stderr[-3000:]}"
            )

    with open(args.landmarks_file) as f:
        num_landmarks = sum(1 for line in f) - 1  # header row

    scenes = args.scenes or sorted(
        d for d in os.listdir(args.scenes_dir)
        if os.path.isdir(os.path.join(args.scenes_dir, d))
    )
    for scene in scenes:
        scene_dir = os.path.join(args.scenes_dir, scene)
        out_dir = os.path.join(args.output_dir, scene)
        os.makedirs(out_dir, exist_ok=True)
        files = sorted(
            f for f in os.listdir(scene_dir)
            if f.lower().endswith((".png", ".jpg", ".bmp"))
        )
        if not files:
            logger.warning("scene %s: no frames, skipping", scene)
            continue
        h, w = cv2.imread(os.path.join(scene_dir, files[0])).shape[:2]

        # [1] detection -> real_test.json (export_object_detection_bounding_boxes)
        cmd = [
            os.path.join(tools_dir, "export_boxes.py"),
            "--image-dir", scene_dir,
            "--checkpoint", args.detector_checkpoint,
            "--output-dir", out_dir,
            "--image-width", str(w), "--image-height", str(h),
            "--input-size", str(args.input_size),
            "--landmarks-count", str(num_landmarks),
            "--batch-size", str(args.batch_size),
            "--no-debug-images",
        ]
        if args.tiny:
            cmd.append("--tiny")
        run(cmd)

        # [2] landmark regression -> pred.mat (tools/test.py)
        run([
            os.path.join(tools_dir, "test_landmarks.py"),
            "--preset", args.preset,
            "--test-json", os.path.join(out_dir, "real_test.json"),
            "--image-dir", scene_dir,
            "--checkpoint", args.landmark_checkpoint,
            "--output", out_dir,
            "--pred-name", "pred",
            *args.opts,
        ])

        # [3] PnP -> opencv_poses.json (export_predicted_poses_real)
        run([
            os.path.join(tools_dir, "export_poses.py"),
            "--frames-dir", scene_dir,
            "--detection-annotations", os.path.join(out_dir, "real_test.json"),
            "--pose-annotations", os.path.join(out_dir, "pred.mat"),
            "--landmarks-file", args.landmarks_file,
            "--calibration-file", args.calibration_file,
            "--output-dir", out_dir,
            "--no-render",
        ])
        logger.info("scene %s done (staged) -> %s", scene, out_dir)


if __name__ == "__main__":
    main()
