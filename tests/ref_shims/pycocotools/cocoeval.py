"""pycocotools.cocoeval shim (import-time-only for the box oracles)."""

from . import mask as maskUtils  # noqa: F401  (rotated_coco_evaluation imports it from here)


class COCOeval:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "COCOeval is out of the oracle shim's scope; the framework's own "
            "evaluator is spacecraft_pose_estimation_tpu/data/coco_eval.py"
        )


class Params:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("COCOeval Params out of oracle scope")
