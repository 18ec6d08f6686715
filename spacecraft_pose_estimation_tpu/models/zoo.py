"""Named detector presets (object_detection_utils.py config_1..config_20).

The reference's experiment registry builds detectron2 cfgs by name; here
each name maps to an (architecture, RCNNConfig/RetinaNetConfig) pair.
`config_4(image_height)` semantics — INPUT sizes pinned to the frame
height, flips off, class-agnostic single-class boxes, 2 detections per
image — are carried by the returned `input_size` and config fields.
"""

from __future__ import annotations

import dataclasses
from typing import Any

from .rcnn import FASTER_RCNN_X101_SPACECRAFT, RCNNConfig, ROIHeadsConfig
from .resnet_backbone import RESNEXT101_32x8d, ResNetConfig
from .retinanet import RetinaNetConfig


@dataclasses.dataclass(frozen=True)
class SolverPreset:
    """The SOLVER/TEST block of a reference registry entry
    (object_detection_utils.py config_N bodies): the exact schedule the
    reference trains that config with."""

    max_iter: int
    base_lr: float
    ims_per_batch: int
    warmup_iters: int
    steps: tuple[int, ...]
    gamma: float = 0.1
    checkpoint_period: int = 500
    eval_period: int = 5000


@dataclasses.dataclass(frozen=True)
class DetectorPreset:
    arch: str  # 'faster_rcnn' | 'retinanet'
    config: Any
    input_size: int | None = None  # None -> pin to image height (config_4)
    flip: bool = False
    solver: SolverPreset | None = None
    notes: str = ""


from .resnet_backbone import RESNET101_FPN as _R101  # noqa: E402

DETECTOR_PRESETS: dict[str, DetectorPreset] = {
    # Faster R-CNN X101-FPN 3x (the paper's main detector)
    "config_1": DetectorPreset(
        arch="faster_rcnn",
        config=dataclasses.replace(
            FASTER_RCNN_X101_SPACECRAFT,
            roi=ROIHeadsConfig(
                num_classes=1, detections_per_image=100,
                batch_size_per_image=128,  # object_detection_utils.py:41
            ),
        ),
        input_size=800,
        flip=True,
        solver=SolverPreset(  # object_detection_utils.py:30-43
            max_iter=5000, base_lr=0.001, ims_per_batch=4, warmup_iters=500,
            steps=(500, 800, 1000, 1100, 1200), gamma=0.05, eval_period=1000,
        ),
        notes="X101-FPN, default sizes/flips, ROI batch 128",
    ),
    # Faster R-CNN R101-FPN 3x
    "config_2": DetectorPreset(
        arch="faster_rcnn",
        config=dataclasses.replace(
            FASTER_RCNN_X101_SPACECRAFT,
            backbone=_R101,
            roi=ROIHeadsConfig(num_classes=1, detections_per_image=100),
        ),
        input_size=800,
        flip=True,
        solver=SolverPreset(  # object_detection_utils.py:46-62
            max_iter=10000, base_lr=0.001, ims_per_batch=8, warmup_iters=200,
            steps=(2000, 6000, 8000), eval_period=2000,
        ),
        notes="R101-FPN",
    ),
    "config_3": DetectorPreset(
        arch="faster_rcnn",
        config=dataclasses.replace(
            FASTER_RCNN_X101_SPACECRAFT,
            roi=ROIHeadsConfig(
                # reference config_3 only sets CLS_AGNOSTIC_BBOX_REG; the
                # detections_per_image=2 cut belongs to config_4
                num_classes=1, cls_agnostic_bbox_reg=True,
                detections_per_image=100,
            ),
        ),
        input_size=1200,  # MIN/MAX_SIZE_TRAIN/TEST = 1200 (utils.py:85-93)
        flip=False,
        solver=SolverPreset(  # object_detection_utils.py:64-97
            max_iter=15000, base_lr=0.0001, ims_per_batch=7, warmup_iters=500,
            steps=(10000,), eval_period=5000,
        ),
        notes="X101-FPN class-agnostic, 1200px",
    ),
    # the pipeline's flagship: sizes pinned to frame height, no flips,
    # class-agnostic, <=2 detections
    "config_4": DetectorPreset(
        arch="faster_rcnn",
        config=FASTER_RCNN_X101_SPACECRAFT,
        input_size=None,
        flip=False,
        solver=SolverPreset(  # object_detection_utils.py:99-134
            max_iter=10000, base_lr=0.0001, ims_per_batch=10, warmup_iters=500,
            steps=(8000,), eval_period=5000,
        ),
        notes="X101-FPN pinned-size class-agnostic (the eval preset)",
    ),
    # RetinaNet R101 3x
    "config_20": DetectorPreset(
        arch="retinanet",
        config=RetinaNetConfig(backbone=_R101, num_classes=1),
        input_size=800,
        # config_20's INPUT block is commented out upstream, so RANDOM_FLIP
        # stays at detectron2's default "horizontal" (defaults.py:68)
        flip=True,
        solver=SolverPreset(  # object_detection_utils.py:136-160
            max_iter=20000, base_lr=0.0001, ims_per_batch=10, warmup_iters=500,
            steps=(6000, 10000, 15000), eval_period=10000,
        ),
        notes="RetinaNet R101",
    ),
}


def get_detector_preset(name: str, image_height: int | None = None) -> DetectorPreset:
    p = DETECTOR_PRESETS[name]
    if p.input_size is None:
        if image_height is None:
            raise ValueError(f"{name} pins input size to the frame height; pass image_height")
        p = dataclasses.replace(p, input_size=image_height)
    return p
