"""Device mesh + sharding helpers (the framework's 'distributed backend').

Unlike the reference's NCCL/Gloo process groups (detectron2
engine/launch.py:27-126, utils/comm.py), parallelism here is compiled:
pick a mesh, annotate shardings, and XLA inserts the collectives over ICI.
"""

from .mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
