#!/usr/bin/env python
"""GT pose annotations -> COCO keypoints json (events_to_coco_dicts.py /
speedplus_to_coco_dicts.py equivalents, one CLI).

Modes:
* blender: per-frame pose_{i}.json {"rotation": 3x3, "translation": 3}
  + camera_intrinsics_{i}.txt, per split subdirectories.
* speedplus: SPEED+ split json with quaternion poses + camera.json
  (landmarks .mat in pixels scaled by ppx).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spacecraft_pose_estimation_tpu.utils import maybe_force_platform

maybe_force_platform()


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="mode", required=True)

    b = sub.add_parser("blender")
    b.add_argument("--frames-dir", required=True)
    b.add_argument("--gt-dir", required=True)
    b.add_argument("--landmarks-file", required=True)
    b.add_argument("--output-prefix", default="synthetic")
    b.add_argument("--output-dir", required=True)
    b.add_argument("--image-width", type=int, default=1280)
    b.add_argument("--image-height", type=int, default=720)
    b.add_argument("--splits", nargs="*", default=["train", "test", "validation"])

    s = sub.add_parser("speedplus")
    s.add_argument("--dataset-dir", required=True)
    s.add_argument("--landmarks-mat", required=True)
    s.add_argument("--camera-json", required=True)
    s.add_argument("--dataset-type", default="synthetic")
    s.add_argument("--split", default="train")
    s.add_argument("--output-dir", required=True)

    args = ap.parse_args()

    import json

    import numpy as np

    from spacecraft_pose_estimation_tpu.data import coco_io
    from spacecraft_pose_estimation_tpu.data.camera import CameraModel

    if args.mode == "blender":
        landmarks = coco_io.load_landmarks_csv(args.landmarks_file)
        for split in args.splits:
            split_dir = os.path.join(args.frames_dir, split)
            files = sorted(os.listdir(split_dir))
            names, Rs, ts, ids = [], [], [], []
            K = None
            for fname in files:
                frame_id = int(fname.split(".")[0])
                K = np.loadtxt(
                    os.path.join(args.gt_dir, f"camera_intrinsics_{frame_id}.txt")
                )
                with open(os.path.join(args.gt_dir, f"pose_{frame_id}.json")) as f:
                    pose = json.load(f)
                names.append(fname)
                Rs.append(np.asarray(pose["rotation"]))
                ts.append(np.asarray(pose["translation"]))
                ids.append(frame_id)
            coco = coco_io.poses_to_coco(
                names, np.stack(Rs), np.stack(ts), landmarks, K,
                args.image_width, args.image_height, image_ids=ids, shuffle_seed=0,
            )
            out = os.path.join(args.output_dir, f"{args.output_prefix}_{split}.json")
            coco_io.save_coco(coco, out)
            print(f"wrote {out} ({len(names)} frames)")
    else:
        import scipy.io

        from spacecraft_pose_estimation_tpu.ops import geometry as G
        import jax.numpy as jnp

        cam = CameraModel.from_speedplus_json(args.camera_json)
        pts = np.array(scipy.io.loadmat(args.landmarks_mat)["pts"]) * cam.pixel_pitch
        with open(
            os.path.join(args.dataset_dir, args.dataset_type, args.split + ".json")
        ) as f:
            poses = json.load(f)
        tkey = "r_Vo2To_vbs_true" if "r_Vo2To_vbs_true" in poses[0] else "translation"
        qkey = "q_vbs2tango_true" if "q_vbs2tango_true" in poses[0] else "rotation"
        names, Rs, ts, ids = [], [], [], []
        for p in poses:
            q = np.asarray(p[qkey], np.float64)
            # reference projects with pose_mat = [quat2dcm(q)^T | t]
            # (speed_plus_utils/utils.py:119-121)
            R = np.asarray(G.quat_to_dcm(jnp.asarray(q))).T
            names.append(p["filename"])
            Rs.append(R)
            ts.append(np.asarray(p[tkey], np.float64))
            ids.append(int(p["filename"].split(".")[0][3:].lstrip("0") or "0"))
        coco = coco_io.poses_to_coco(
            names, np.stack(Rs), np.stack(ts), pts, cam.K,
            width=1920, height=1200, image_ids=ids, dist=cam.dist,
            visibility_width=1900,  # reference quirk (speedplus_to_coco:137)
            force_visible=True,  # ...whose vis test is a no-op: both
            # branches append vis=2 (speedplus_to_coco_dicts.py:15-27)
        )
        out = os.path.join(
            args.output_dir, f"{args.dataset_type}_{args.split}.json"
        )
        coco_io.save_coco(coco, out)
        print(f"wrote {out} ({len(names)} frames)")


if __name__ == "__main__":
    main()
