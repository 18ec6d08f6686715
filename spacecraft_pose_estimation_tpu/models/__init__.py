"""Model families: HRNet heatmap nets, SimpleBaseline, detectors, discriminator.

Registry mirrors the reference's ``models.<NAME>.get_pose_net`` lookup
(landmark_regression/tools/train.py) with a plain dict.
"""

from .hrnet import (
    HRNET_CMS,
    HRNET_CMS_384,
    HRNET_TINY,
    HRNet,
    HRNetConfig,
    POSE_HRNET_W32,
)
from .pose_resnet import PoseResNet, PoseResNetConfig
from .discriminator import MultiScaleDiscriminator


def build_landmark_model(name: str, num_joints: int, **kwargs):
    """Build a landmark-regression model by reference name."""
    if name == "pose_hrnet":
        return HRNet(config=POSE_HRNET_W32.with_joints(num_joints), **kwargs)
    if name == "hrnet_cms":
        return HRNet(config=HRNET_CMS.with_joints(num_joints), **kwargs)
    if name == "hrnet_cms_384":
        return HRNet(config=HRNET_CMS_384.with_joints(num_joints), **kwargs)
    if name == "hrnet_tiny":  # CPU test/CI config
        return HRNet(config=HRNET_TINY.with_joints(num_joints), **kwargs)
    if name == "hrnet_golden":  # golden-parity harness (torch-matched stem)
        from .hrnet import HRNET_GOLDEN

        return HRNet(config=HRNET_GOLDEN.with_joints(num_joints), **kwargs)
    if name == "hrnet_tiny_cms":  # CPU test/CI config, multi-scale heads
        import dataclasses

        return HRNet(
            config=dataclasses.replace(HRNET_TINY.with_joints(num_joints), head="cms"),
            **kwargs,
        )
    if name == "pose_resnet":
        return PoseResNet(config=PoseResNetConfig(num_joints=num_joints), **kwargs)
    raise ValueError(f"unknown landmark model: {name}")
