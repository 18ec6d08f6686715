#!/usr/bin/env python
"""Random 70/15/15 train/validation/test frame split (split_images.py)."""

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spacecraft_pose_estimation_tpu.data.coco_io import split_files


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input-dir", required=True)
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--fractions", nargs=3, type=float, default=[0.7, 0.15, 0.15])
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--move", action="store_true", help="move instead of copy")
    args = ap.parse_args()

    files = sorted(
        f for f in os.listdir(args.input_dir)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))
    )
    splits = split_files(files, tuple(args.fractions), seed=args.seed)
    op = shutil.move if args.move else shutil.copy2
    for split, names in splits.items():
        out = os.path.join(args.output_dir, split)
        os.makedirs(out, exist_ok=True)
        for f in names:
            op(os.path.join(args.input_dir, f), os.path.join(out, f))
        print(f"{split}: {len(names)} frames")


if __name__ == "__main__":
    main()
