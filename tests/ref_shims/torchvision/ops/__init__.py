"""torchvision.ops shim for the vendored detectron2's layer wrappers
(layers/nms.py, layers/roi_align.py, modeling/poolers.py,
layers/deform_conv.py). nms and roi_align are ON the Faster R-CNN
inference path, so they are implemented exactly (semantics per the
torchvision CUDA/CPU kernels the wrappers document); RoIPool /
deform_conv2d are import-time-only for the X101-FPN oracle and raise
on use."""

from . import boxes  # noqa: F401
from .boxes import batched_nms, nms  # noqa: F401
from .roi_align import roi_align  # noqa: F401


class RoIPool:
    def __init__(self, output_size, spatial_scale):
        raise NotImplementedError("RoIPool is out of the oracle shim's scope")


def deform_conv2d(*args, **kwargs):
    raise NotImplementedError("deform_conv2d is out of the oracle shim's scope")
