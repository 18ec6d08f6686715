"""Minimal pycocotools shim (not installed in this image).

The vendored detectron2 imports pycocotools at module level from its
data/evaluation layers; the box-only stage-script oracles never
evaluate COCO metrics or touch RLE masks, so everything here exists
for import success and raises on real use (the framework's own COCO
evaluation lives in spacecraft_pose_estimation_tpu/data/coco_eval.py).
"""
