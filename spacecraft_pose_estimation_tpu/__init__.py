"""spacecraft_pose_estimation_tpu — a TPU-native spacecraft 6-DoF pose pipeline.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
mohsij/spacecraft-pose-estimation: object detection -> landmark regression
(HRNet heatmaps) -> PnP pose solving, plus DVS event simulation, fused into
compiled graphs over a `jax.sharding.Mesh` instead of the reference's
file-and-subprocess cascade (reference: evaluate_pipeline.py:48-91).

Import alias convention::

    import spacecraft_pose_estimation_tpu as spe
"""

__version__ = "0.1.0"
