"""v2e CLI surface tests (v2e_args.py parity: camera presets, input
windowing, video outputs, auto timestamp resolution)."""
import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def frames_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("v2e_frames")
    rng = np.random.default_rng(0)
    for i in range(8):
        img = np.zeros((60, 80), np.uint8)
        cv2.circle(img, (10 + i * 8, 30), 6, 255, -1)
        img += rng.integers(0, 10, img.shape).astype(np.uint8)
        cv2.imwrite(str(d / f"{i:03d}.png"), img)
    return d


def run(args, **kw):
    env = dict(os.environ, JAX_PLATFORMS="cpu", SPE_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "v2e.py"), *map(str, args)],
        capture_output=True, text=True, env=env, timeout=900, **kw,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    return r


class TestV2eCli:
    def test_camera_preset_resizes(self, frames_dir, tmp_path):
        out = tmp_path / "o"
        run(["-i", frames_dir, "-o", out, "--dvs128",
             "--dvs_exposure", "duration", "0.05", "--dvs_text", "ev.csv"])
        bmps = list((out / "event-frames").glob("*.bmp"))
        assert bmps
        img = cv2.imread(str(bmps[0]))
        assert img.shape[:2] == (128, 128)
        # dvs-video.avi rendered by default (renderer.py:327-343)
        assert (out / "dvs-video.avi").exists()

    def test_crop_start_stop_and_numpy(self, frames_dir, tmp_path):
        out = tmp_path / "o"
        run(["-i", frames_dir, "-o", out,
             "--crop", 4, 4, 2, 2, "--start_time", 0.0, "--stop_time", 0.2,
             "--input_frame_rate", 30,
             "--dvs_exposure", "duration", "0.05", "--dvs_numpy", "ev.npy",
             "--skip_video_output"])
        ev = np.load(out / "ev.npy")
        assert ev.ndim == 2 and ev.shape[1] == 4
        bmps = list((out / "event-frames").glob("*.bmp"))
        img = cv2.imread(str(bmps[0]))
        assert img.shape[:2] == (60 - 4, 80 - 8)

    def test_vid_orig_and_unique_folder(self, frames_dir, tmp_path):
        out = tmp_path / "o"
        run(["-i", frames_dir, "-o", out, "--vid_orig", "orig.avi",
             "--no_frames"])
        assert (out / "orig.avi").exists()
        # rerun into the same folder: unique_output_folder (default true)
        # must create o-1 instead of failing
        run(["-i", frames_dir, "-o", out, "--no_frames"])
        assert (tmp_path / "o-1").exists()

    def test_auto_timestamp_resolution(self, frames_dir, tmp_path):
        out = tmp_path / "o"
        r = run(["-i", frames_dir, "-o", out, "--auto_timestamp_resolution",
                 "--dvs_exposure", "duration", "0.05", "--no_frames"])
        assert "auto timestamp resolution" in r.stdout
        assert "upsampled" in r.stdout

    def test_timestamp_resolution_fixed(self, frames_dir, tmp_path):
        out = tmp_path / "o"
        r = run(["-i", frames_dir, "-o", out, "--timestamp_resolution", "0.01",
                 "--input_frame_rate", 25, "--no_frames"])
        # 25 fps * 0.01 s -> ceil(1/0.25) = 4x upsampling
        assert "upsampled" in r.stdout

    def test_synthetic_input_plugin(self, tmp_path):
        out = tmp_path / "o"
        run(["--synthetic_input",
             "spacecraft_pose_estimation_tpu.events.synthetic_input",
             "-o", out, "--dvs_exposure", "duration", "0.02",
             "--dvs_text", "ev.csv", "--no_frames"])
        assert (out / "ev.csv").exists()

    def test_output_in_place_with_synthetic_input_rejected(self):
        """--output_in_place has no source folder under --synthetic_input:
        must exit with a clear usage error, not a TypeError traceback."""
        env = dict(os.environ, JAX_PLATFORMS="cpu", SPE_PLATFORM="cpu")
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "v2e.py"),
             "--synthetic_input",
             "spacecraft_pose_estimation_tpu.events.synthetic_input",
             "--output_in_place"],
            capture_output=True, text=True, env=env, timeout=300,
        )
        assert r.returncode != 0
        assert "output_in_place requires --input" in (r.stderr + r.stdout)
        assert "TypeError" not in r.stderr

    def test_check_lowpass_warning(self, frames_dir, tmp_path):
        """Under-sampled IIR lowpass must emit the v2e_utils.check_lowpass
        warning (eps = dt/tau > 0.3); a well-sampled run must not."""
        out = tmp_path / "o"
        r = run(["-i", frames_dir, "-o", out, "--cutoff_hz", "300",
                 "--input_frame_rate", "30", "--disable_slomo",
                 "--dvs_exposure", "duration", "0.05", "--no_frames"])
        assert "under-sampled" in r.stderr
        out2 = tmp_path / "o2"
        r2 = run(["-i", frames_dir, "-o", out2, "--cutoff_hz", "1",
                  "--input_frame_rate", "30", "--disable_slomo",
                  "--dvs_exposure", "duration", "0.05", "--no_frames"])
        assert "under-sampled" not in r2.stderr

    def test_input_slowmotion_factor_speeds_up_event_time(self, frames_dir, tmp_path):
        """Reference v2e.py:343: srcFrameIntervalS = (1/fps)/factor — a
        slow-motion source means HIGHER real frame rate, so the event
        timeline shrinks by the factor."""
        import re

        def video_time(out_dir, extra):
            r = run(["-i", frames_dir, "-o", out_dir, "--disable_slomo",
                     "--input_frame_rate", "30", "--no_frames",
                     "--dvs_exposure", "duration", "0.01"] + extra)
            m = re.search(r"over ([0-9.]+)s of video", r.stdout)
            assert m, r.stdout[-500:]
            return float(m.group(1))

        t_plain = video_time(tmp_path / "a", [])
        t_slomo = video_time(tmp_path / "b", ["--input_slowmotion_factor", "2"])
        # stdout prints the duration %.3f-rounded
        assert abs(t_slomo - t_plain / 2) < 1e-3, (t_plain, t_slomo)

    def test_overflow_warning_on_high_contrast(self, frames_dir, tmp_path):
        """>max_iters events/pixel/frame must print the clip warning."""
        r = run(["-i", frames_dir, "-o", tmp_path / "o", "--disable_slomo",
                 "--pos_thres", "0.05", "--neg_thres", "0.05",
                 "--no_frames", "--dvs_exposure", "duration", "0.01"])
        assert "clipped by the static max_iters" in r.stderr

    def test_dvs_vid_full_scale_changes_contrast(self, frames_dir, tmp_path):
        import cv2

        def first_frame(out, fs):
            run(["-i", frames_dir, "-o", out, "--disable_slomo",
                 "--dvs_exposure", "duration", "0.05", "--skip_video_output",
                 "--dvs_vid_full_scale", fs])
            f = sorted((out / "event-frames").glob("*.bmp"))[0]
            return cv2.imread(str(f), cv2.IMREAD_GRAYSCALE).astype(np.int32)

        a = first_frame(tmp_path / "fs1", 1)
        b = first_frame(tmp_path / "fs8", 8)
        # same events, different normalization: fs=1 saturates harder
        assert np.abs(a - b).max() > 10
