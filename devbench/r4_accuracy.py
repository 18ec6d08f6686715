"""Round-4 realistic-scale accuracy run (VERDICT r3 missing #2):

Generate a synthetic event dataset in-repo, train HRNet-W32 at the
reference's events-config geometry (512^2 -> 128^2, sigma 2, adam 1e-3,
40 epochs) on the TPU, export the trained weights to torch, then run
BOTH pipelines on the held-out test split:

  ours:      tools/test_landmarks.py -> pred.mat -> tools/export_poses.py
  reference: landmark_regression/tools/test.py (UNMODIFIED, CPU via
             ref_shims) -> pred.mat -> export_predicted_poses_real.py

and score rotation/translation errors vs the exact synthetic GT for
both, plus the cross-pipeline deltas (BASELINE.md "within 1%" north
star). Writes devbench/logs/r4_accuracy_report.json.

Usage: python devbench/r4_accuracy.py <workdir> [--stage all|data|train|eval]
"""

import argparse
import glob
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIMS = os.path.join(REPO, "tests", "ref_shims")
TOOLS = os.path.join(REPO, "tools")
REF_LM = "/root/reference/landmark_regression"
REF_POSE = "/root/reference/pose_estimation"

_N_JOINTS_CACHE: dict = {}


def n_joints(work):
    """Joint count = scene landmark count (craft_geometry: 8 body corners
    + 2+2 panel tips = 12). Hardcoding it wrong (the r4s3 run used 16)
    trains fine on zero-padded joints but breaks the reference-side
    eval: EventsDataset._get_db (events.py:67-68) reshapes the COCO
    keypoints to (-1,3) and assigns into a (NUM_JOINTS,3) array.

    Parses the CSV properly (header row + data rows; blank lines
    ignored) and caches per workdir."""
    if work not in _N_JOINTS_CACHE:
        import csv

        with open(os.path.join(work, "scene", "landmarks.csv")) as f:
            rows = [r for r in csv.reader(f) if r and any(c.strip() for c in r)]
        _N_JOINTS_CACHE[work] = len(rows) - 1  # minus the x,y,z header
    return _N_JOINTS_CACHE[work]
# 854x480 rather than the reference's 1280x720: the emulator+renderer
# holds (frames, max_iters, H, W) dense event maps on-device, and
# 240x8x720x1280xf32 = 6.6 GB temp OOMs the 16 GB chip next to the
# frame stack; 480p keeps the identical pipeline at a 3.1 GB peak.
# The landmark stage is scale-free (bbox crops resample to 512^2).
W, H = 854, 480
# Micro-scale knobs for mechanics validation (e.g. a CPU dry run with
# SPE_PLATFORM=cpu): shrink the scene and the schedule without touching
# the real-run defaults.
N_FRAMES = int(os.environ.get("R4ACC_FRAMES", "240"))
EPOCHS = int(os.environ.get("R4ACC_EPOCHS", "0"))  # 0 = preset default (40)
# Per-epoch validation (59 frames through the host data pipeline) and
# per-epoch orbax saves (~18 s each) dominate wall time on a 1-vCPU
# host; R4ACC_VAL=0 / R4ACC_CKPT_PERIOD=N trade them away when the run
# must fit a session window. Neither affects the trained weights.
SKIP_VAL = os.environ.get("R4ACC_VAL", "1") == "0"
CKPT_PERIOD = int(os.environ.get("R4ACC_CKPT_PERIOD", "0"))  # 0 = preset
# Static event-iteration cap for the v2e scan. The r4s6 run kept the
# default max_iters=8 and clipped/deferred ~33% of the events (2.1M)
# with up-to-one-frame timestamp skew (ADVICE r4). 16 eliminates the
# overflow at this scene's contrast; device memory is bounded by the
# chunked v2e scan (--dvs_frame_chunk) regardless of this value, and 16
# still clipped 423k/5.0M events on the 240-frame scene, so default 32.
MAX_ITERS = int(os.environ.get("R4ACC_MAX_ITERS", "32"))
# Learning gate between train and eval (VERDICT r4 weak #2): the r4s6
# run spent ~40 min of eval subprocesses on a model with OKS AP 0.00.
MIN_AP50 = float(os.environ.get("R4ACC_MIN_AP50", "0.5"))
if os.environ.get("R4ACC_SIZE"):
    W, H = (int(v) for v in os.environ["R4ACC_SIZE"].split("x"))
T0 = time.time()


def log(msg):
    print(f"[r4acc t+{time.time()-T0:.0f}s] {msg}", flush=True)


def run(cmd, env=None, cwd=None):
    log("+ " + " ".join(map(str, cmd)))
    subprocess.run(cmd, check=True, env=env, cwd=cwd)


def find(root, name):
    hits = glob.glob(os.path.join(root, "**", name), recursive=True)
    assert hits, f"{name} not under {root}"
    return hits[0]


def ref_env():
    env = dict(os.environ)
    env["PYTHONPATH"] = SHIMS
    env["SPE_PLATFORM"] = "cpu"
    env.setdefault("OMP_NUM_THREADS", "1")
    return env


def stage_data(work):
    scene = os.path.join(work, "scene")
    run([sys.executable, os.path.join(TOOLS, "make_synthetic_scene.py"), "render",
         "--output-dir", scene, "--num-frames", str(N_FRAMES),
         "--width", str(W), "--height", str(H)])
    events = os.path.join(work, "events")
    # idempotency: a stale events/ from a crashed earlier run makes v2e
    # auto-increment to events-1/ and desyncs every downstream path
    import shutil

    if os.path.isdir(events):
        shutil.rmtree(events)
    run([sys.executable, os.path.join(TOOLS, "v2e.py"),
         "-i", os.path.join(scene, "frames"), "-o", events,
         "--dvs_params", "clean", "--dvs_exposure", "duration", "0.02",
         "--dvs_max_iters", str(MAX_ITERS)])
    ef = os.path.join(events, "event-frames")
    run([sys.executable, os.path.join(TOOLS, "make_synthetic_scene.py"), "gt",
         "--scene-dir", scene, "--event-frames-dir", ef,
         "--gt-dir", os.path.join(work, "gt")])
    run([sys.executable, os.path.join(TOOLS, "split_images.py"),
         "--input-dir", ef, "--output-dir", ef + "_split", "--seed", "0"])
    run([sys.executable, os.path.join(TOOLS, "convert_to_coco.py"), "blender",
         "--frames-dir", ef + "_split", "--gt-dir", os.path.join(work, "gt"),
         "--landmarks-file", os.path.join(scene, "landmarks.csv"),
         "--output-dir", os.path.join(work, "dicts"),
         "--image-width", str(W), "--image-height", str(H)])


def stage_train(work):
    ef = os.path.join(work, "events", "event-frames")
    run([sys.executable, os.path.join(TOOLS, "train_landmarks.py"),
         "--preset", "events",
         "--train-json", os.path.join(work, "dicts", "synthetic_train.json")]
        + ([] if SKIP_VAL else
           ["--val-json", os.path.join(work, "dicts", "synthetic_validation.json"),
            "--val-image-dir", ef + "_split/validation"])
        + ["--image-dir", ef + "_split/train",
           "--output", os.path.join(work, "landmarks"),
           "MODEL.NUM_JOINTS", str(n_joints(work))]
        + (["TRAIN.END_EPOCH", str(EPOCHS),
            # keep the preset's 62.5%/87.5% MultiStepLR shape when the
            # epoch budget is overridden (the preset's absolute (25, 35)
            # would decay LR to 1e-5 at epoch 35 of a longer run)
            "TRAIN.LR_STEP", f"[{int(EPOCHS * 0.625)}, {int(EPOCHS * 0.875)}]"]
           if EPOCHS else [])
        + (["TRAIN.CHECKPOINT_PERIOD", str(CKPT_PERIOD)] if CKPT_PERIOD else []))


def stage_gate(work):
    """Hard learning gate between train and eval (VERDICT r4 #2): score
    the trained model on the VALIDATION split and abort loudly when it
    never learned, instead of burning ~40 min of reference-pipeline
    eval subprocesses on garbage (the r4s6 failure mode)."""
    ef = os.path.join(work, "events", "event-frames")
    val_json = os.path.join(work, "dicts", "synthetic_validation.json")
    val_imgs = ef + "_split/validation"
    ckpt = glob.glob(os.path.join(work, "landmarks", "**", "checkpoints"),
                     recursive=True)[0]
    gate_out = os.path.join(work, "gate_eval")
    run([sys.executable, os.path.join(TOOLS, "test_landmarks.py"),
         "--preset", "events", "--test-json", val_json,
         "--image-dir", val_imgs, "--checkpoint", ckpt,
         "--output", gate_out, "--pred-name", "pred_val_gate",
         "MODEL.NUM_JOINTS", str(n_joints(work))])
    import scipy.io as scio

    sys.path.insert(0, REPO)
    from spacecraft_pose_estimation_tpu.data.landmark_dataset import LandmarkExamples
    from spacecraft_pose_estimation_tpu.train.landmark_loop import oks_metrics

    preds = np.asarray(
        scio.loadmat(os.path.join(gate_out, "pred_val_gate.mat"))["preds"],
        np.float32,
    )
    res = oks_metrics(preds, LandmarkExamples(val_json, val_imgs))
    log(f"GATE: val OKS AP={res['AP']:.3f} AP50={res['AP50']:.3f} "
        f"AP75={res['AP75']:.3f} (floor AP50 >= {MIN_AP50})")
    if res["AP50"] < MIN_AP50:
        raise SystemExit(
            f"GATE FAILED: val OKS AP50 {res['AP50']:.3f} < {MIN_AP50} — "
            "the model did not learn; fix training before running the "
            "cross-pipeline eval (R4ACC_MIN_AP50 overrides the floor)."
        )


def stage_eval(work):
    scene = os.path.join(work, "scene")
    ef = os.path.join(work, "events", "event-frames")
    test_json = os.path.join(work, "dicts", "synthetic_test.json")
    test_imgs = ef + "_split/test"
    ckpt_dirs = glob.glob(os.path.join(work, "landmarks", "**", "checkpoints"),
                          recursive=True)
    assert ckpt_dirs, "no trained checkpoint"
    ckpt = ckpt_dirs[0]

    # ---- ours: landmarks -> pred.mat -> poses ----
    our_out = os.path.join(work, "our_eval")
    run([sys.executable, os.path.join(TOOLS, "test_landmarks.py"),
         "--preset", "events", "--test-json", test_json,
         "--image-dir", test_imgs, "--checkpoint", ckpt,
         "--output", our_out, "--pred-name", "pred_test",
         "MODEL.NUM_JOINTS", str(n_joints(work))])
    our_mat = find(our_out, "pred_test.mat")
    our_poses = os.path.join(work, "our_poses")
    run([sys.executable, os.path.join(TOOLS, "export_poses.py"),
         "--frames-dir", test_imgs, "--detection-annotations", test_json,
         "--pose-annotations", our_mat,
         "--landmarks-file", os.path.join(scene, "landmarks.csv"),
         "--calibration-file", os.path.join(scene, "calibration.json"),
         "--output-dir", our_poses, "--solver", "ransac", "--no-render"])

    # ---- export trained weights to torch ----
    pth = os.path.join(work, "trained_w32.pth")
    run([sys.executable, os.path.join(TOOLS, "export_weights.py"),
         "--checkpoint", ckpt, "--model", "pose_hrnet",
         "--num-joints", str(n_joints(work)), "--image-size", "512", "512",
         "--output", pth])

    # ---- reference: tools/test.py on the exported weights (CPU) ----
    ref_root = os.path.join(work, "ref_root")
    os.makedirs(ref_root, exist_ok=True)
    import shutil

    shutil.copyfile(test_json, os.path.join(ref_root, "test.json"))
    yaml_path = os.path.join(work, "ref_events_w32.yaml")
    _write_ref_yaml(yaml_path, work, ref_root, test_imgs, pth)
    env = ref_env()
    run([sys.executable, os.path.join(SHIMS, "run_ref_cpu.py"),
         os.path.join(REF_LM, "tools", "test.py"), "--cfg", yaml_path],
        env=env, cwd=work)
    ref_mat = find(os.path.join(work, "ref_out"), "pred_test.mat")
    ref_poses = os.path.join(work, "ref_poses")
    os.makedirs(ref_poses, exist_ok=True)
    run([sys.executable, os.path.join(SHIMS, "run_ref_cpu.py"),
         os.path.join(REF_POSE, "export_predicted_poses_real.py"),
         "--frames_dir", test_imgs, "--detection_annotations", test_json,
         "--pose_annotations", ref_mat,
         "--landmarks_file", os.path.join(scene, "landmarks.csv"),
         "--calibration_file_path", os.path.join(scene, "calibration.json"),
         "--output_dir", ref_poses],
        env=env, cwd=work)

    report(work, our_mat, ref_mat,
           os.path.join(our_poses, "opencv_poses.json"),
           os.path.join(ref_poses, "opencv_poses.json"))


def _write_ref_yaml(path, work, ref_root, img_dir, model_file):
    import yaml

    stages = {
        "STAGE2": {"NUM_MODULES": 1, "NUM_BRANCHES": 2, "BLOCK": "BASIC",
                   "NUM_BLOCKS": [4, 4], "NUM_CHANNELS": [32, 64],
                   "FUSE_METHOD": "SUM"},
        "STAGE3": {"NUM_MODULES": 4, "NUM_BRANCHES": 3, "BLOCK": "BASIC",
                   "NUM_BLOCKS": [4, 4, 4], "NUM_CHANNELS": [32, 64, 128],
                   "FUSE_METHOD": "SUM"},
        "STAGE4": {"NUM_MODULES": 3, "NUM_BRANCHES": 4, "BLOCK": "BASIC",
                   "NUM_BLOCKS": [4, 4, 4, 4],
                   "NUM_CHANNELS": [32, 64, 128, 256], "FUSE_METHOD": "SUM"},
    }
    cfg = {
        "AUTO_RESUME": False,
        "DATA_DIR": img_dir,
        "OUTPUT_DIR": os.path.join(work, "ref_out"),
        "LOG_DIR": os.path.join(work, "ref_log"),
        "WORKERS": 0,
        "PRINT_FREQ": 100,
        "DATASET": {"COLOR_RGB": True, "DATASET": "EventsDataset",
                    "DATA_FORMAT": "png", "FLIP": False, "ROOT": ref_root,
                    "TEST_SET": "test", "IMAGE_WIDTH": W, "IMAGE_HEIGHT": H},
        "MODEL": {"INIT_WEIGHTS": False, "NAME": "pose_hrnet",
                  "NUM_JOINTS": n_joints(work), "PRETRAINED": "",
                  "TARGET_TYPE": "gaussian", "IMAGE_SIZE": [512, 512],
                  "HEATMAP_SIZE": [128, 128], "SIGMA": 2,
                  "EXTRA": {"PRETRAINED_LAYERS": ["*"],
                            "FINAL_CONV_KERNEL": 1, **stages}},
        "LOSS": {"USE_TARGET_WEIGHT": True},
        "TEST": {"BATCH_SIZE_PER_GPU": 4, "MODEL_FILE": model_file,
                 "FLIP_TEST": False, "POST_PROCESS": True,
                 "SHIFT_HEATMAP": True},
        "DEBUG": {"DEBUG": False, "SAVE_BATCH_IMAGES_GT": False,
                  "SAVE_BATCH_IMAGES_PRED": False, "SAVE_HEATMAPS_GT": False,
                  "SAVE_HEATMAPS_PRED": False},
    }
    os.makedirs(cfg["OUTPUT_DIR"], exist_ok=True)
    os.makedirs(cfg["LOG_DIR"], exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)


def report(work, our_mat, ref_mat, our_poses_json, ref_poses_json):
    import scipy.io as scio

    scene = json.load(open(os.path.join(work, "scene", "scene.json")))
    sys.path.insert(0, TOOLS)
    from make_synthetic_scene import pose_at  # noqa: E402

    def gt_for(name):
        stem = int(os.path.splitext(name)[0])
        return pose_at(scene, stem / gt_max_stem * (scene["num_frames"] - 1))

    # GT stems span the full event set (same clock as the gt stage)
    all_stems = sorted(
        int(os.path.splitext(p)[0])
        for p in os.listdir(os.path.join(work, "events", "event-frames"))
        if p.endswith(".bmp")
    )
    gt_max_stem = max(all_stems[-1], 1)

    def pose_errors(poses_json):
        poses = json.load(open(poses_json))
        assert poses, f"no poses in {poses_json}"
        rot, tr = [], []
        for p in poses:
            Rg, tg = gt_for(p["image_name"])
            Rp = np.asarray(p["rotation_matrix"], np.float64)
            tp = np.asarray(p["T"], np.float64).reshape(3)
            cosang = (np.trace(Rg.T @ Rp) - 1) / 2
            rot.append(float(np.degrees(np.arccos(np.clip(cosang, -1, 1)))))
            tr.append(float(np.linalg.norm(tp - tg) / np.linalg.norm(tg)))
        rot, tr = np.asarray(rot), np.asarray(tr)
        bad = int(np.sum(~(np.isfinite(rot) & np.isfinite(tr))))
        # A scoring failure must fail the run, not emit a NaN report
        # (ADVICE r4: the r4s6 run reported rc=0 with every 'ours'
        # metric NaN).
        assert bad == 0, (
            f"{bad}/{len(rot)} non-finite pose errors from {poses_json}"
        )
        return rot, tr

    our_rot, our_tr = pose_errors(our_poses_json)
    ref_rot, ref_tr = pose_errors(ref_poses_json)

    our_kp = np.asarray(scio.loadmat(our_mat)["preds"], np.float64)
    ref_kp = np.asarray(scio.loadmat(ref_mat)["preds"], np.float64)
    kp_d = np.linalg.norm(our_kp[..., :2] - ref_kp[..., :2], axis=-1)

    # SPEED-style pose score: rot (rad) + relative translation error
    def speed(rot, tr):
        return float(np.mean(np.deg2rad(rot) + tr))

    rep = {
        "n_test": int(our_rot.shape[0]),
        "ours": {"rot_deg_median": float(np.median(our_rot)),
                 "rot_deg_mean": float(np.mean(our_rot)),
                 "trans_rel_median": float(np.median(our_tr)),
                 "trans_rel_mean": float(np.mean(our_tr)),
                 "speed_score": speed(our_rot, our_tr)},
        "reference_pipeline_same_weights": {
            "rot_deg_median": float(np.median(ref_rot)),
            "rot_deg_mean": float(np.mean(ref_rot)),
            "trans_rel_median": float(np.median(ref_tr)),
            "trans_rel_mean": float(np.mean(ref_tr)),
            "speed_score": speed(ref_rot, ref_tr)},
        "cross_pipeline": {
            "keypoint_px_median": float(np.median(kp_d)),
            "keypoint_px_p90": float(np.quantile(kp_d, 0.9)),
            "speed_score_rel_delta": float(
                abs(speed(our_rot, our_tr) - speed(ref_rot, ref_tr))
                / max(speed(ref_rot, ref_tr), 1e-9)),
        },
    }
    out = os.path.join(
        REPO, "devbench", "logs",
        os.environ.get("R4ACC_REPORT", "r4_accuracy_report.json"),
    )
    with open(out, "w") as f:
        json.dump(rep, f, indent=1, allow_nan=False)
    log(json.dumps(rep, indent=1))
    log(f"report -> {out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--stage", default="all",
                    choices=["all", "data", "train", "gate", "eval"])
    args = ap.parse_args()
    # Absolute: stage_eval runs reference subprocesses with cwd=workdir,
    # which silently re-roots any relative path (the r4s3 eval failure).
    work = os.path.abspath(args.workdir)
    os.makedirs(work, exist_ok=True)
    if args.stage in ("all", "data"):
        stage_data(work)
    if args.stage in ("all", "train"):
        stage_train(work)
    if args.stage in ("all", "gate", "eval"):
        stage_gate(work)
    if args.stage in ("all", "eval"):
        stage_eval(work)


if __name__ == "__main__":
    main()
