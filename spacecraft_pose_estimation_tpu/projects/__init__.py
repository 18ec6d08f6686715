"""TPU-native rebuilds of the reference's detectron2 ``projects/`` family.

Reference: object_detection/detectron2/projects/ — PointRend, DeepLab,
Panoptic-DeepLab, TridentNet, PointSup, Rethinking-BatchNorm, TensorMask,
and DensePose (chart-based core: heads, predictor, losses, converters —
the CSE/video/evaluator tooling beyond the modeling core is recorded in
PARITY.md).

Every module follows the repo's conventions: NHWC flax modules, fixed
shapes (padded + masked instances), functional losses, and XLA-friendly
control flow — no ragged per-image python loops, no CUDA kernels.

Submodules (import directly, e.g. ``from ..projects import point_rend``):
``point_rend``, ``deeplab``, ``panoptic_deeplab``, ``densepose``,
``tridentnet``, ``pointsup``, ``rethinking_bn``, ``tensormask``,
``vitdet``, ``mvitv2``. They are intentionally NOT imported here — each
pulls in its model stack, and CLI tools should pay only for what they
use.
"""
