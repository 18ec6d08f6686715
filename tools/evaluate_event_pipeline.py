#!/usr/bin/env python
"""Event-camera pipeline evaluation (evaluate_event_pipeline.sh:97-116).

The reference bash script converts real AEDAT recordings to undistorted
event frames, then runs the full detect->regress->solve evaluation. This
driver chains tools/convert_aedats.py and tools/evaluate_pipeline.py.
"""

import argparse
import os
import subprocess
import sys

TOOLS = os.path.dirname(os.path.abspath(__file__))


def run(cmd):
    print("+", " ".join(cmd), flush=True)
    subprocess.run([sys.executable] + cmd, check=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--recordings-dir", required=True)
    ap.add_argument("--calibration-file", required=True)
    ap.add_argument("--landmarks-file", required=True)
    ap.add_argument("--detector-checkpoint", required=True)
    ap.add_argument("--landmark-checkpoint", required=True)
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--width", type=int, default=346)
    ap.add_argument("--height", type=int, default=260)
    ap.add_argument("--exposure", type=float, default=0.01)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--input-size", type=int, default=768)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("opts", nargs="*",
                    help="KEY VALUE overrides forwarded to the evaluator")
    args = ap.parse_args()

    frames_dir = os.path.join(args.output_dir, "event-frames")
    run([
        os.path.join(TOOLS, "convert_aedats.py"),
        "--recordings-dir", args.recordings_dir,
        "--output-dir", frames_dir,
        "--calibration-file", args.calibration_file,
        "--width", str(args.width),
        "--height", str(args.height),
        "--exposure", str(args.exposure),
    ])
    cmd = [
        os.path.join(TOOLS, "evaluate_pipeline.py"),
        "--scenes-dir", frames_dir,
        "--landmarks-file", args.landmarks_file,
        "--calibration-file", args.calibration_file,
        "--detector-checkpoint", args.detector_checkpoint,
        "--landmark-checkpoint", args.landmark_checkpoint,
        "--output-dir", os.path.join(args.output_dir, "results"),
        "--input-size", str(args.input_size),
        "--batch-size", str(args.batch_size),
    ]
    if args.tiny:
        cmd.append("--tiny")
    cmd += args.opts
    run(cmd)


if __name__ == "__main__":
    main()
