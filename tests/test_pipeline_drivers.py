"""Executed end-to-end tests for the remaining driver CLIs (VERDICT r1
#8): e2v, evaluate_event_pipeline, train_pipeline_dvs — real tiny data
through real subprocesses, asserting the produced artifacts.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # e2e subprocess tier

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "SPE_PLATFORM": "cpu", "JAX_PLATFORMS": "cpu"}


def run(cmd):
    r = subprocess.run(
        [sys.executable] + cmd, cwd=REPO, env=ENV, capture_output=True, text=True
    )
    if r.returncode != 0:
        raise AssertionError(
            f"cmd failed: {cmd}\nstdout:{r.stdout[-3000:]}\nstderr:{r.stderr[-3000:]}"
        )
    return r


class TestE2V:
    def test_csv_to_frames(self, tmp_path):
        """events CSV -> duration-exposure frames; reference e2v
        semantics: ms timestamps flag, polarity forced positive."""
        rng = np.random.default_rng(0)
        n = 4000
        t_ms = np.sort(rng.uniform(0, 50, n))  # 50 ms of events
        ev = np.stack(
            [t_ms, rng.integers(0, 64, n), rng.integers(0, 48, n),
             rng.integers(0, 2, n)], axis=1
        )
        csv = tmp_path / "events.csv"
        np.savetxt(csv, ev, delimiter=",", fmt=["%.6f", "%d", "%d", "%d"])
        out = tmp_path / "frames"
        run([
            "tools/e2v.py", "-i", str(csv), "-o", str(out),
            "--width", "64", "--height", "48",
            "--timestamp-unit", "ms", "--exposure", "0.01",
        ])
        import cv2

        frames = sorted(out.glob("*.bmp"))
        assert len(frames) >= 4  # 50 ms at 10 ms exposure
        img = cv2.imread(str(frames[0]), cv2.IMREAD_GRAYSCALE)
        assert img.shape == (48, 64)
        # force-positive polarity: accumulated frame must be >= mid-grey
        assert img.min() >= 127
        assert (out / "frame_times.txt").exists()


@pytest.fixture(scope="module")
def dvs_scene(tmp_path_factory):
    """Tiny moving-dot video + blender-style GT for the DVS drivers.

    GT files are keyed by the EVENT-frame names v2e emits (the reference
    contract: events_to_coco_dicts.py:88-96 looks up
    camera_intrinsics_<frame_stem>.txt / pose_<frame_stem>.json), so we
    run v2e once up front to discover the emitted frame times and write
    GT for exactly those stems.
    """
    import cv2
    from scipy.spatial.transform import Rotation

    root = tmp_path_factory.mktemp("dvs")
    frames = root / "video"
    gt = root / "gt"
    frames.mkdir()
    gt.mkdir()
    lm = np.array(
        [[x, y, z] for x in (-0.5, 0.5) for y in (-0.5, 0.5) for z in (-0.5, 0.5)]
    )
    K = np.array([[80.0, 0, 32.0], [0, 80.0, 32.0], [0, 0, 1.0]])
    import pandas as pd

    pd.DataFrame(lm, columns=["x", "y", "z"]).to_csv(root / "landmarks.csv", index=False)
    (root / "calibration.json").write_text(
        json.dumps({"intrinsics": {"camera_matrix": K.tolist(),
                                   "distortion_coefficients": [0, 0, 0, 0, 0]}})
    )

    def pose_at(phase):
        R = Rotation.from_euler("xyz", [0.05 * phase, 0.03 * phase, 0]).as_matrix()
        return R, np.array([0.0, 0.0, 4.0])

    for i in range(10):
        R, t = pose_at(i)
        uv = (lm @ R.T + t) @ K.T
        uv = uv[:, :2] / uv[:, 2:3]
        img = np.zeros((64, 64, 3), np.uint8)
        for x, y in uv:
            cv2.circle(img, (int(x), int(y)), 2, (255, 255, 255), -1)
        cv2.imwrite(str(frames / f"{i:04d}.png"), img)

    # discover the event-frame stems v2e will emit for these settings
    probe = root / "v2e_probe"
    run([
        "tools/v2e.py", "-i", str(frames), "-o", str(probe),
        "--dvs_params", "clean", "--dvs_exposure", "duration", "0.02",
    ])
    stems = sorted(
        int(p.stem) for p in (probe / "event-frames").glob("*.bmp")
    )
    assert stems, "v2e probe emitted no event frames"
    for s in stems:
        R, t = pose_at(s / max(stems[-1], 1) * 9)  # smooth trajectory
        np.savetxt(str(gt / f"camera_intrinsics_{s}.txt"), K)
        (gt / f"pose_{s}.json").write_text(
            json.dumps({"rotation": R.tolist(), "translation": t.tolist()})
        )
    return root


class TestTrainPipelineDVS:
    def test_end_to_end_tiny(self, dvs_scene, tmp_path):
        """Full reference workflow (train_pipeline_hubble_dvx.sh): v2e
        sweep -> split -> COCO dicts -> train detector -> train HRNet."""
        work = tmp_path / "work"
        run([
            "tools/train_pipeline_dvs.py",
            "--frames-dir", str(dvs_scene / "video"),
            "--gt-dir", str(dvs_scene / "gt"),
            "--landmarks-file", str(dvs_scene / "landmarks.csv"),
            "--work-dir", str(work),
            "--exposures", "0.02",
            "--image-width", "64", "--image-height", "64",
            "--detector-iters", "2",
            "--detector-input-size", "64", "--detector-batch-size", "2",
            "--landmark-epochs", "1",
            "--tiny",
            "MODEL.IMAGE_SIZE", "[64, 64]",
            "MODEL.HEATMAP_SIZE", "[16, 16]",
            "TRAIN.BATCH_SIZE_PER_CHIP", "2",
            "TEST.BATCH_SIZE_PER_CHIP", "2",
        ])
        assert (work / "events_0.02" / "event-frames").is_dir()
        assert (work / "detector" / "checkpoints").is_dir()
        assert (work / "landmarks" / "checkpoints").is_dir()

        # the intermediate COCO dicts must be real annotations, not
        # empty shells: every image carries a box + 8 labelled keypoints
        dicts = next(work.glob("**/synthetic_train.json"))
        coco = json.loads(dicts.read_text())
        assert coco["images"] and coco["annotations"]
        for ann in coco["annotations"]:
            assert ann["bbox"][2] > 0 and ann["bbox"][3] > 0
            kps = np.asarray(ann["keypoints"], np.float64).reshape(-1, 3)
            assert kps.shape[0] == 8
            assert set(np.unique(kps[:, 2])) <= {1.0, 2.0}  # vis convention


class TestEvaluateEventPipeline:
    def test_end_to_end_tiny(self, dvs_scene, tmp_path):
        """AEDAT-4 recording -> frames -> fused detect/regress/solve,
        reusing checkpoints trained on the spot (2-iter smoke nets)."""
        from spacecraft_pose_estimation_tpu.events import aedat4 as a4

        # train throwaway tiny checkpoints on the synthetic video frames
        work = tmp_path / "train"
        run([
            "tools/train_pipeline_dvs.py",
            "--frames-dir", str(dvs_scene / "video"),
            "--gt-dir", str(dvs_scene / "gt"),
            "--landmarks-file", str(dvs_scene / "landmarks.csv"),
            "--work-dir", str(work),
            "--exposures", "0.02",
            "--image-width", "64", "--image-height", "64",
            "--detector-iters", "2",
            "--detector-input-size", "64", "--detector-batch-size", "2",
            "--landmark-epochs", "1",
            "--tiny",
            "MODEL.IMAGE_SIZE", "[64, 64]",
            "MODEL.HEATMAP_SIZE", "[16, 16]",
            "TRAIN.BATCH_SIZE_PER_CHIP", "2",
            "TEST.BATCH_SIZE_PER_CHIP", "2",
        ])

        # synthesize a real AEDAT-4 recording
        rng = np.random.default_rng(2)
        n = 3000
        ev = np.stack(
            [np.sort(rng.uniform(0, 0.05, n)), rng.integers(0, 64, n),
             rng.integers(0, 64, n), rng.integers(0, 2, n) * 2 - 1], axis=1
        )
        recs = tmp_path / "recs"
        recs.mkdir()
        a4.write_aedat4(str(recs / "sceneA.aedat4"), ev,
                        compression=a4.COMPRESSION_LZ4)

        out = tmp_path / "eval"
        run([
            "tools/evaluate_event_pipeline.py",
            "--recordings-dir", str(recs),
            "--calibration-file", str(dvs_scene / "calibration.json"),
            "--landmarks-file", str(dvs_scene / "landmarks.csv"),
            "--detector-checkpoint", str(work / "detector" / "checkpoints"),
            "--landmark-checkpoint", str(work / "landmarks" / "checkpoints"),
            "--output-dir", str(out),
            "--width", "64", "--height", "64",
            "--exposure", "0.01",
            "--tiny", "--input-size", "64", "--batch-size", "2",
            "MODEL.NAME", "hrnet_tiny",
            "MODEL.IMAGE_SIZE", "[64, 64]",
            "MODEL.HEATMAP_SIZE", "[16, 16]",
            "MODEL.COMPUTE_DTYPE", "float32",
        ])
        scene_out = out / "results" / "sceneA"
        for artifact in ("real_test.json", "pred.mat", "opencv_poses.json"):
            assert (scene_out / artifact).exists(), artifact

        # Artifact quality (VERDICT r2 weak #7): the three stage files
        # must be well-formed and mutually consistent — same frame set,
        # finite near-image keypoints, orthonormal right-handed
        # rotations — not merely present.
        coco = json.loads((scene_out / "real_test.json").read_text())
        assert coco["images"], "no event frames made it into the COCO dict"
        assert len(coco["annotations"]) == len(coco["images"])  # one box/frame
        for ann in coco["annotations"]:
            _, _, w, h = ann["bbox"]
            assert w > 0 and h > 0

        import scipy.io as scio

        preds = scio.loadmat(str(scene_out / "pred.mat"))["preds"]
        assert preds.shape == (len(coco["images"]), 8, 3)  # (N, J, x/y/conf)
        assert np.isfinite(preds).all()
        # decoded keypoints live in source-image coords; allow one
        # frame-width of crop overhang around the 64x64 frames
        assert (np.abs(preds[..., :2] - 32.0) <= 96.0).all()

        poses = json.loads((scene_out / "opencv_poses.json").read_text())
        assert len(poses) == len(coco["images"])
        names = {os.path.basename(im["file_name"]) for im in coco["images"]}
        for p in poses:
            assert os.path.basename(p["image_name"]) in names
            R = np.asarray(p["rotation_matrix"], np.float64)
            assert R.shape == (3, 3)
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
            assert abs(np.linalg.det(R) - 1.0) < 1e-3
            T = np.asarray(p["T"], np.float64)
            assert T.shape == (3, 1) and np.isfinite(T).all()
