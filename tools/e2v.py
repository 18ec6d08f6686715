#!/usr/bin/env python
"""Events CSV -> frames (v2e/e2v.py:28-141 equivalent).

Reads ``t,x,y,p`` CSV (timestamp unit flags, optional xy swap, polarity
collapsed to +1 per the reference), bins events into duration-exposure
frames and writes ``{t}.bmp`` files + a frame-times list.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spacecraft_pose_estimation_tpu.utils import maybe_force_platform

maybe_force_platform()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-i", "--input", required=True, help="events CSV")
    ap.add_argument("-o", "--output-folder", required=True)
    ap.add_argument("--width", type=int, required=True)
    ap.add_argument("--height", type=int, required=True)
    ap.add_argument("--timestamp-unit", choices=["s", "ms", "us"], default="s")
    ap.add_argument("--swap-xy", action="store_true")
    ap.add_argument("--delim_whitespace", action="store_true", default=None,
                    help="input is space-separated (v2e --dvs_text "
                         "contract); default sniffs the first data line")
    ap.add_argument("--keep-polarity", action="store_true",
                    help="keep -1/+1 instead of the reference's force-positive")
    ap.add_argument("--exposure", type=float, default=0.01, help="seconds per frame")
    ap.add_argument("--full-scale-count", type=int, default=3)
    args = ap.parse_args()

    import cv2

    from spacecraft_pose_estimation_tpu.events import io as ev_io

    events = ev_io.read_events_csv(
        args.input,
        timestamp_unit=args.timestamp_unit,
        swap_xy=args.swap_xy,
        force_pos_polarity=not args.keep_polarity,
        delim_whitespace=args.delim_whitespace,
    )
    if len(events) == 0:
        print("no events")
        return
    os.makedirs(args.output_folder, exist_ok=True)
    frame_times = []
    for img01, t_end in ev_io.accumulate_exposure_frames(
        events, args.width, args.height, args.exposure, args.full_scale_count
    ):
        img = (img01 * 255).astype("uint8")
        t_ms = t_end * 1e3
        cv2.imwrite(
            os.path.join(args.output_folder, f"{t_ms:.0f}.bmp"),
            cv2.cvtColor(img, cv2.COLOR_GRAY2BGR),
        )
        frame_times.append(t_ms)
    with open(os.path.join(args.output_folder, "frame_times.txt"), "w") as f:
        f.writelines(f"{t:.3f}\n" for t in frame_times)
    print(f"wrote {len(frame_times)} frames to {args.output_folder}")


if __name__ == "__main__":
    main()
