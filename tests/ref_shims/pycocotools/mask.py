"""pycocotools.mask shim: RLE mask codecs are out of the box-only
oracle scope; imported at module level by detectron2/data/
detection_utils.py, structures/masks.py, utils/visualizer.py."""


def _unsupported(*args, **kwargs):
    raise NotImplementedError(
        "pycocotools RLE masks are out of the oracle shim's scope"
    )


encode = _unsupported
decode = _unsupported
area = _unsupported
toBbox = _unsupported
frPyObjects = _unsupported
merge = _unsupported
iou = _unsupported
