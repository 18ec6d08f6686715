#!/usr/bin/env python
"""Real event recordings -> undistorted event frames per scene
(v2e/convert_aedats.py + aedat_to_csv.py equivalents).

Supports AEDAT-2.0 (our binary reader), AEDAT-4 (native decoder,
events/aedat4.py — flatbuffer container with NONE/LZ4/ZSTD packet
compression) and events CSV inputs. Each recording becomes events CSV
-> duration-exposure frames -> cv2.undistort with the calibration
intrinsics.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spacecraft_pose_estimation_tpu.utils import maybe_force_platform

maybe_force_platform()


def load_events(path: str, width: int, height: int):
    from spacecraft_pose_estimation_tpu.events import io as ev_io

    if path.endswith((".aedat", ".aedat2")):
        return ev_io.read_aedat2(path, width, height)
    if path.endswith(".csv"):
        return ev_io.read_events_csv(path, force_pos_polarity=False)
    if path.endswith(".aedat4"):
        import numpy as np

        from spacecraft_pose_estimation_tpu.events.aedat4 import read_aedat4

        ev_us = read_aedat4(path)  # (N, 4) int64 [t_us, x, y, p 0/1]
        ev = ev_us.astype(np.float64)
        ev[:, 0] /= 1e6
        ev[:, 3] = 2 * ev[:, 3] - 1
        return ev
    raise SystemExit(f"unsupported recording format: {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--recordings-dir", required=True)
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--calibration-file", required=True)
    ap.add_argument("--width", type=int, default=346)
    ap.add_argument("--height", type=int, default=260)
    ap.add_argument("--exposure", type=float, default=0.01)
    args = ap.parse_args()

    import cv2

    from spacecraft_pose_estimation_tpu.data.camera import CameraModel
    from spacecraft_pose_estimation_tpu.events import io as ev_io

    cam = CameraModel.from_calibration_json(args.calibration_file)

    recs = sorted(
        f for f in os.listdir(args.recordings_dir)
        if f.endswith((".aedat", ".aedat2", ".aedat4", ".csv"))
    )
    for rec in recs:
        scene = os.path.splitext(rec)[0]
        out = os.path.join(args.output_dir, scene)
        os.makedirs(out, exist_ok=True)
        events = load_events(os.path.join(args.recordings_dir, rec), args.width, args.height)
        ev_io.write_events_csv(events, os.path.join(out, "events.csv"))
        if len(events) == 0:
            continue
        n_frames = 0
        for img01, t_end in ev_io.accumulate_exposure_frames(
            events, args.width, args.height, args.exposure
        ):
            img = (img01 * 255).astype("uint8")
            img = cv2.undistort(img, cam.K, cam.dist)
            cv2.imwrite(
                os.path.join(out, f"{t_end * 1e3:.0f}.bmp"),
                cv2.cvtColor(img, cv2.COLOR_GRAY2BGR),
            )
            n_frames += 1
        print(f"{scene}: {len(events)} events -> {n_frames} frames")


if __name__ == "__main__":
    main()
