"""End-to-end CLI smoke tests on tiny synthetic data (CPU subprocesses).

Exercises the full reference workflow surface: convert -> split ->
train landmarks -> test landmarks -> export poses -> v2e simulation.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # e2e/oracle tier (> ~30 s)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "SPE_PLATFORM": "cpu", "JAX_PLATFORMS": "cpu"}


def run(cmd, **kw):
    r = subprocess.run(
        [sys.executable] + cmd, cwd=REPO, env=ENV, capture_output=True, text=True, **kw
    )
    if r.returncode != 0:
        raise AssertionError(f"cmd failed: {cmd}\nstdout:{r.stdout[-3000:]}\nstderr:{r.stderr[-3000:]}")
    return r


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    """Synthetic scene: white-dot landmarks of a cube projected into
    64x64 frames + blender-style GT + COCO jsons."""
    import cv2
    from scipy.spatial.transform import Rotation

    root = tmp_path_factory.mktemp("scene")
    rng = np.random.default_rng(0)
    lm = np.array(
        [[x, y, z] for x in (-0.5, 0.5) for y in (-0.5, 0.5) for z in (-0.5, 0.5)]
        + [[0, 0, 0], [0.3, 0, 0], [0, 0.3, 0], [0, 0, 0.3]]
    )  # 12 landmarks
    K = np.array([[80.0, 0, 32.0], [0, 80.0, 32.0], [0, 0, 1.0]])
    frames_dir = root / "frames"
    gt_dir = root / "gt"
    for split in ("train", "test", "validation"):
        (frames_dir / split).mkdir(parents=True)
    gt_dir.mkdir()

    import pandas as pd

    pd.DataFrame(lm, columns=["x", "y", "z"]).to_csv(root / "landmarks.csv", index=False)
    (root / "calibration.json").write_text(
        json.dumps({"intrinsics": {"camera_matrix": K.tolist(),
                                   "distortion_coefficients": [0, 0, 0, 0, 0]}})
    )

    n_per = {"train": 8, "validation": 2, "test": 2}
    idx = 0
    for split, n in n_per.items():
        for _ in range(n):
            R = Rotation.from_euler("xyz", rng.uniform(-0.3, 0.3, 3)).as_matrix()
            t = np.array([0.0, 0.0, 4.0]) + rng.normal(0, 0.1, 3)
            uv = (lm @ R.T + t) @ K.T
            uv = uv[:, :2] / uv[:, 2:3]
            img = np.zeros((64, 64, 3), np.uint8)
            for x, y in uv:
                cv2.circle(img, (int(x), int(y)), 1, (255, 255, 255), -1)
            cv2.imwrite(str(frames_dir / split / f"{idx}.png"), img)
            np.savetxt(str(gt_dir / f"camera_intrinsics_{idx}.txt"), K)
            (gt_dir / f"pose_{idx}.json").write_text(
                json.dumps({"rotation": R.tolist(), "translation": t.tolist()})
            )
            idx += 1
    return {"root": root, "frames": frames_dir, "gt": gt_dir, "K": K, "lm": lm}


@pytest.fixture(scope="module")
def coco_jsons(scene):
    out = scene["root"] / "dicts"
    out.mkdir()
    run([
        "tools/convert_to_coco.py", "blender",
        "--frames-dir", str(scene["frames"]),
        "--gt-dir", str(scene["gt"]),
        "--landmarks-file", str(scene["root"] / "landmarks.csv"),
        "--output-prefix", "synthetic",
        "--output-dir", str(out),
        "--image-width", "64", "--image-height", "64",
    ])
    for split in ("train", "test", "validation"):
        assert (out / f"synthetic_{split}.json").exists()
    return out


@pytest.fixture(scope="module")
def trained(scene, coco_jsons, tmp_path_factory):
    outdir = tmp_path_factory.mktemp("train_out")
    # flatten frames into one dir for training (file_name has no split prefix)
    flat = scene["root"] / "flat"
    flat.mkdir()
    for split in ("train", "test", "validation"):
        for f in (scene["frames"] / split).iterdir():
            (flat / f.name).symlink_to(f)
    run([
        "tools/train_landmarks.py",
        "--preset", "events",
        "--train-json", str(coco_jsons / "synthetic_train.json"),
        "--image-dir", str(flat),
        "--output", str(outdir),
        "MODEL.NAME", "hrnet_tiny",
        "MODEL.IMAGE_SIZE", "[64, 64]",
        "MODEL.HEATMAP_SIZE", "[16, 16]",
        "TRAIN.BATCH_SIZE_PER_CHIP", "4",
        "TRAIN.END_EPOCH", "1",
        "TEST.BATCH_SIZE_PER_CHIP", "4",
        "MODEL.COMPUTE_DTYPE", "float32",
    ])
    assert (outdir / "checkpoints").exists()
    return {"outdir": outdir, "flat": flat}


class TestWorkflow:
    def test_split_images(self, scene, tmp_path):
        run([
            "tools/split_images.py",
            "--input-dir", str(scene["frames"] / "train"),
            "--output-dir", str(tmp_path / "split"),
            "--seed", "0",
        ])
        counts = {s: len(list((tmp_path / "split" / s).iterdir()))
                  for s in ("train", "validation", "test")}
        assert sum(counts.values()) == 8

    def test_train_and_test_landmarks(self, scene, coco_jsons, trained, tmp_path):
        out = tmp_path / "test_out"
        run([
            "tools/test_landmarks.py",
            "--preset", "events",
            "--test-json", str(coco_jsons / "synthetic_test.json"),
            "--image-dir", str(trained["flat"]),
            "--checkpoint", str(trained["outdir"] / "checkpoints"),
            "--output", str(out),
            "MODEL.NAME", "hrnet_tiny",
            "MODEL.IMAGE_SIZE", "[64, 64]",
            "MODEL.HEATMAP_SIZE", "[16, 16]",
            "TEST.BATCH_SIZE_PER_CHIP", "2",
            "MODEL.COMPUTE_DTYPE", "float32",
        ])
        from scipy.io import loadmat

        preds = loadmat(str(out / "pred_test.mat"))["preds"]
        assert preds.shape == (2, 12, 3)

    def test_export_poses(self, scene, coco_jsons, trained, tmp_path):
        # reuse pred.mat from a fresh test run
        out = tmp_path / "poses"
        test_out = tmp_path / "kp"
        run([
            "tools/test_landmarks.py",
            "--preset", "events",
            "--test-json", str(coco_jsons / "synthetic_test.json"),
            "--image-dir", str(trained["flat"]),
            "--checkpoint", str(trained["outdir"] / "checkpoints"),
            "--output", str(test_out),
            "MODEL.NAME", "hrnet_tiny",
            "MODEL.IMAGE_SIZE", "[64, 64]",
            "MODEL.HEATMAP_SIZE", "[16, 16]",
            "TEST.BATCH_SIZE_PER_CHIP", "2",
            "MODEL.COMPUTE_DTYPE", "float32",
        ])
        run([
            "tools/export_poses.py",
            "--frames-dir", str(trained["flat"]),
            "--detection-annotations", str(coco_jsons / "synthetic_test.json"),
            "--pose-annotations", str(test_out / "pred_test.mat"),
            "--landmarks-file", str(scene["root"] / "landmarks.csv"),
            "--calibration-file", str(scene["root"] / "calibration.json"),
            "--output-dir", str(out),
            "--solver", "gn",
            "--no-render",
        ])
        poses = json.loads((out / "opencv_poses.json").read_text())
        assert len(poses) == 2
        assert np.asarray(poses[0]["rotation_matrix"]).shape == (3, 3)
        assert np.asarray(poses[0]["T"]).shape == (3, 1)

    def test_fused_evaluate_pipeline(self, scene, coco_jsons, trained, tmp_path):
        """Train a tiny detector 2 iters, then run the one-graph
        detect->crop->regress->solve scene evaluation end to end."""
        det_out = tmp_path / "det"
        run([
            "tools/train_detector.py",
            "--train-json", str(coco_jsons / "synthetic_train.json"),
            "--image-dir", str(trained["flat"]),
            "--output", str(det_out),
            # registry-driven launch (reference --config config_N); the
            # explicit flags override the preset's solver fields so the
            # smoke stays tiny
            "--preset", "config_1",
            "--tiny", "--input-size", "64", "--batch-size", "2",
            "--max-iter", "2", "--checkpoint-period", "2",
        ])
        # scene dir layout: scenes/<scene>/frames
        scenes = tmp_path / "scenes"
        (scenes / "s0").mkdir(parents=True)
        for f in (scene["frames"] / "test").iterdir():
            (scenes / "s0" / f.name).symlink_to(f)
        out = tmp_path / "eval"
        run([
            "tools/evaluate_pipeline.py",
            "--scenes-dir", str(scenes),
            "--landmarks-file", str(scene["root"] / "landmarks.csv"),
            "--calibration-file", str(scene["root"] / "calibration.json"),
            "--detector-checkpoint", str(det_out / "checkpoints"),
            "--landmark-checkpoint", str(trained["outdir"] / "checkpoints"),
            "--output-dir", str(out),
            "--preset", "events",
            "--tiny", "--input-size", "64", "--batch-size", "2",
            "MODEL.NAME", "hrnet_tiny",
            "MODEL.IMAGE_SIZE", "[64, 64]",
            "MODEL.COMPUTE_DTYPE", "float32",
        ])
        for artifact in ("pred.mat", "real_test.json", "opencv_poses.json"):
            assert (out / "s0" / artifact).exists(), artifact

    def test_v2e_simulation(self, scene, tmp_path):
        out = tmp_path / "v2e_out"
        run([
            "tools/v2e.py",
            "-i", str(scene["frames"] / "train"),
            "-o", str(out),
            "--dvs_params", "clean",
            "--dvs_text", "events.csv",
            "--dvs_exposure", "duration", "0.05",
        ])
        assert (out / "info.txt").exists()
        assert (out / "events.csv").exists()
        frames = list((out / "event-frames").iterdir())
        assert frames

    @pytest.mark.slow
    def test_staged_evaluate_pipeline_matches_fused(self, scene, coco_jsons, trained, tmp_path):
        """--staged runs the three stage CLIs as separate processes on
        the file contract (reference evaluate_pipeline.py:48-91) and must
        produce the same artifacts as the fused one-graph mode."""
        det_out = tmp_path / "det"
        run([
            "tools/train_detector.py",
            "--train-json", str(coco_jsons / "synthetic_train.json"),
            "--image-dir", str(trained["flat"]),
            "--output", str(det_out),
            "--tiny", "--input-size", "64", "--batch-size", "2",
            "--max-iter", "2", "--checkpoint-period", "2",
        ])
        scenes = tmp_path / "scenes"
        (scenes / "s0").mkdir(parents=True)
        for f in (scene["frames"] / "test").iterdir():
            (scenes / "s0" / f.name).symlink_to(f)
        common = [
            "tools/evaluate_pipeline.py",
            "--scenes-dir", str(scenes),
            "--landmarks-file", str(scene["root"] / "landmarks.csv"),
            "--calibration-file", str(scene["root"] / "calibration.json"),
            "--detector-checkpoint", str(det_out / "checkpoints"),
            "--landmark-checkpoint", str(trained["outdir"] / "checkpoints"),
            "--preset", "events",
            "--tiny", "--input-size", "64", "--batch-size", "2",
        ]
        opts = [
            "MODEL.NAME", "hrnet_tiny",
            "MODEL.IMAGE_SIZE", "[64, 64]",
            "MODEL.HEATMAP_SIZE", "[16, 16]",
            "TEST.BATCH_SIZE_PER_CHIP", "2",
            "MODEL.COMPUTE_DTYPE", "float32",
        ]
        fused_out = tmp_path / "fused"
        staged_out = tmp_path / "staged"
        run(common + ["--output-dir", str(fused_out)] + opts)
        run(common + ["--staged", "--output-dir", str(staged_out)] + opts)

        for artifact in ("pred.mat", "real_test.json", "opencv_poses.json"):
            assert (staged_out / "s0" / artifact).exists(), artifact

        # boxes: staged real_test.json must carry the same detections
        import json as _json

        fused_coco = _json.loads((fused_out / "s0" / "real_test.json").read_text())
        staged_coco = _json.loads((staged_out / "s0" / "real_test.json").read_text())
        assert len(fused_coco["annotations"]) == len(staged_coco["annotations"])
        fb = np.array([a["bbox"] for a in fused_coco["annotations"]])
        sb = np.array([a["bbox"] for a in staged_coco["annotations"]])
        np.testing.assert_allclose(sb, fb, atol=1.5)  # same detector, same argmax box

        # keypoints: same crops + same net -> near-identical predictions.
        # The 2-iter smoke nets emit near-noise heatmaps, so argmax decode
        # can jitter by a few px at bin boundaries; the tolerance still
        # catches coordinate-space/contract errors (tens of px).
        from scipy.io import loadmat

        fp = loadmat(str(fused_out / "s0" / "pred.mat"))["preds"]
        sp = loadmat(str(staged_out / "s0" / "pred.mat"))["preds"]
        assert fp.shape == sp.shape
        # robust agreement: a coordinate-space/contract error would shift
        # EVERY keypoint by tens of px; near-noise argmax may hop a bin
        # on a few individual joints, so assert on the 90th percentile
        diff = np.abs(sp[:, :, :2] - fp[:, :, :2])
        assert np.quantile(diff, 0.9) < 6.0, np.quantile(diff, 0.9)
        assert np.median(diff) < 2.0, np.median(diff)

        # poses: both artifacts list every frame with valid shapes
        fposes = _json.loads((fused_out / "s0" / "opencv_poses.json").read_text())
        sposes = _json.loads((staged_out / "s0" / "opencv_poses.json").read_text())
        assert [p["image_name"] for p in fposes] == [p["image_name"] for p in sposes]

    def test_benchmark_train_det(self):
        """tools/benchmark.py train-det (d2 tools/benchmark.py:69-134
        train-throughput counterpart) runs and reports s/iter."""
        r = run([
            "tools/benchmark.py", "--task", "train-det",
            "--model", "RCNN_TINY", "--input-size", "64", "--batch-size", "2",
        ])
        assert "s/iter" in r.stdout and "images/s" in r.stdout

    def test_demo_single_image(self, scene, trained, tmp_path):
        """Executed demo: image + box -> keypoints + pose + overlay jpg
        (landmark_regression/demo parity)."""
        img = next((scene["frames"] / "test").glob("*.png"))
        out = tmp_path / "demo.jpg"
        r = run([
            "tools/demo.py",
            "--image", str(img),
            "--checkpoint", str(trained["outdir"] / "checkpoints"),
            "--model", "hrnet_tiny",
            "--image-size", "64", "64",
            "--landmarks-file", str(scene["root"] / "landmarks.csv"),
            "--calibration-file", str(scene["root"] / "calibration.json"),
            "--output", str(out),
        ])
        assert out.exists()
        assert "mean confidence" in r.stdout
        import cv2

        assert cv2.imread(str(out)) is not None
