#!/usr/bin/env python
"""DVS training pipeline driver (train_pipeline_hubble_dvx.sh:8-53).

The reference bash script runs: a multi-exposure v2e sweep over source
frames -> split -> COCO conversion -> detector train -> HRNet train.
This driver chains the same stages through our CLIs in-process.
"""

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOOLS = os.path.dirname(os.path.abspath(__file__))


def run(cmd):
    print("+", " ".join(cmd), flush=True)
    subprocess.run([sys.executable] + cmd, check=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames-dir", required=True, help="source video frames")
    ap.add_argument("--gt-dir", required=True, help="blender GT (poses+intrinsics)")
    ap.add_argument("--landmarks-file", required=True)
    ap.add_argument("--work-dir", required=True)
    ap.add_argument("--exposures", nargs="*", type=float,
                    default=[0.005, 0.01, 0.02, 0.04],
                    help="v2e exposure sweep (the reference runs 4)")
    ap.add_argument("--image-width", type=int, default=1280)
    ap.add_argument("--image-height", type=int, default=720)
    ap.add_argument("--detector-iters", type=int, default=6000)
    ap.add_argument("--detector-input-size", type=int, default=768)
    ap.add_argument("--detector-batch-size", type=int, default=8)
    ap.add_argument("--landmark-epochs", type=int, default=40)
    ap.add_argument("--tiny", action="store_true", help="tiny models (CI)")
    ap.add_argument("opts", nargs="*",
                    help="KEY VALUE overrides forwarded to the landmark trainer")
    args = ap.parse_args()

    os.makedirs(args.work_dir, exist_ok=True)

    # 1) v2e sweep: one event-frame set per exposure
    event_dirs = []
    for exp in args.exposures:
        out = os.path.join(args.work_dir, f"events_{exp:g}")
        run([
            os.path.join(TOOLS, "v2e.py"),
            "-i", args.frames_dir, "-o", out,
            "--dvs_params", "clean",
            "--dvs_exposure", "duration", str(exp),
        ])
        event_dirs.append(os.path.join(out, "event-frames"))

    # 2) split each sweep's frames
    for d in event_dirs:
        run([
            os.path.join(TOOLS, "split_images.py"),
            "--input-dir", d,
            "--output-dir", d + "_split",
            "--seed", "0",
        ])

    # 3) COCO conversion per sweep (GT poses are shared across exposures)
    dict_dirs = []
    for d in event_dirs:
        out = d + "_dicts"
        run([
            os.path.join(TOOLS, "convert_to_coco.py"), "blender",
            "--frames-dir", d + "_split",
            "--gt-dir", args.gt_dir,
            "--landmarks-file", args.landmarks_file,
            "--output-dir", out,
            "--image-width", str(args.image_width),
            "--image-height", str(args.image_height),
        ])
        dict_dirs.append(out)

    # 4) train detector on the first sweep
    det_cmd = [
        os.path.join(TOOLS, "train_detector.py"),
        "--train-json", os.path.join(dict_dirs[0], "synthetic_train.json"),
        "--image-dir", event_dirs[0] + "_split/train",
        "--output", os.path.join(args.work_dir, "detector"),
        "--max-iter", str(args.detector_iters),
        "--input-size", str(args.detector_input_size),
        "--batch-size", str(args.detector_batch_size),
    ]
    if args.tiny:
        det_cmd.append("--tiny")
    run(det_cmd)

    # 5) train HRNet
    lm_cmd = [
        os.path.join(TOOLS, "train_landmarks.py"),
        "--preset", "events",
        "--train-json", os.path.join(dict_dirs[0], "synthetic_train.json"),
        "--val-json", os.path.join(dict_dirs[0], "synthetic_validation.json"),
        "--image-dir", event_dirs[0] + "_split/train",
        "--val-image-dir", event_dirs[0] + "_split/validation",
        "--output", os.path.join(args.work_dir, "landmarks"),
        "TRAIN.END_EPOCH", str(args.landmark_epochs),
        *args.opts,
    ]
    if args.tiny:
        lm_cmd += ["MODEL.NAME", "hrnet_tiny", "MODEL.COMPUTE_DTYPE", "float32"]
    run(lm_cmd)

    print("pipeline training complete:", args.work_dir)


if __name__ == "__main__":
    main()
