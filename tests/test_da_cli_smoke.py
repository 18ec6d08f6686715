"""DA training CLI smoke test (tiny CMS model, CPU subprocess)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # e2e/oracle tier (> ~30 s)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "SPE_PLATFORM": "cpu", "JAX_PLATFORMS": "cpu"}


@pytest.fixture(scope="module")
def tiny_domains(tmp_path_factory):
    import cv2

    from spacecraft_pose_estimation_tpu.data import coco_io

    root = tmp_path_factory.mktemp("da")
    rng = np.random.default_rng(0)
    out = {}
    for domain in ("source", "target"):
        d = root / domain
        d.mkdir()
        images, anns = [], []
        for i in range(4):
            img = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
            cv2.imwrite(str(d / f"{i}.png"), img)
            images.append(coco_io.image_record(f"{i}.png", 64, 64, i))
            kp = np.column_stack(
                [rng.uniform(8, 56, 3), rng.uniform(8, 56, 3), np.full(3, 2.0)]
            )
            anns.append(coco_io.keypoint_annotation(kp, [8.0, 8.0, 32.0, 32.0], i, i))
        coco = coco_io.build_coco_dict(images, anns, 3)
        coco_io.save_coco(coco, str(root / f"{domain}.json"))
        out[domain] = d
    return {"root": root, **out}


def test_da_cli_one_epoch(tiny_domains, tmp_path):
    root = tiny_domains["root"]
    r = subprocess.run(
        [
            sys.executable, "tools/train_landmarks_da.py",
            "--preset", "lightbox_cms",
            "--train-json", str(root / "source.json"),
            "--image-dir", str(tiny_domains["source"]),
            "--target-json", str(root / "target.json"),
            "--target-image-dir", str(tiny_domains["target"]),
            "--output", str(tmp_path / "out"),
            "MODEL.NAME", "hrnet_tiny_cms",
            "MODEL.NUM_JOINTS", "3",
            "MODEL.IMAGE_SIZE", "[64, 64]",
            "MODEL.HEATMAP_SIZE", "[64, 64]",
            "MODEL.COMPUTE_DTYPE", "float32",
            "TRAIN.BATCH_SIZE_PER_CHIP", "2",
            "TRAIN.BATCH_SIZE_ADVERSARIAL", "2",
            "TRAIN.END_EPOCH", "1",
        ],
        cwd=REPO, env=ENV, capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    metrics = (tmp_path / "out" / "metrics.json").read_text().strip().splitlines()
    row = json.loads(metrics[-1])
    for k in ("loss", "d_loss", "hm_loss"):
        assert k in row and np.isfinite(row[k])
