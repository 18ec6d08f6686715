"""torchvision shim: the two entry points the reference's landmark stack
touches — transforms.Compose/ToTensor/Normalize (tools/test.py:106-108)
and utils.make_grid (lib/utils/vis.py:28, debug images only)."""

from . import transforms, utils  # noqa: F401
