"""torchvision shim: the entry points the reference stacks touch —
transforms.Compose/ToTensor/Normalize (landmark tools/test.py:106-108),
utils.make_grid (lib/utils/vis.py:28, debug images only), and the ops
the vendored detectron2 wraps (nms/roi_align on the inference path,
layers/nms.py + layers/roi_align.py)."""

__version__ = "0.11.0"  # >= (0,7): layers/roi_align.py's aligned gate

from . import ops, transforms, utils  # noqa: F401
