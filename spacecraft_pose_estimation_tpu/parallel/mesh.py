"""Mesh construction and sharding rules.

The reference's parallelism inventory (SURVEY.md §2.7) is data-parallel
only (torch DataParallel / DDP + NCCL all-reduce). The TPU-native mapping:

* a 2-D logical mesh ``(data, model)`` — the model axis is 1 for the
  small CNNs of this domain but kept first-class so tensor-sharded
  variants drop in without re-plumbing;
* batches sharded ``P('data')``; params/optimizer state replicated
  (gradient psum is inserted by XLA — the DDP all-reduce equivalent);
* BatchNorm statistics under jit are computed over the *global* batch,
  which upgrades the reference's NaiveSyncBatchNorm
  (detectron2 layers/batch_norm.py:152-212) to exact sync for free.

Multi-host: data loading shards by ``jax.process_index()``; eval-side
host gathers use ``jax.experimental.multihost_utils`` (over DCN), the
equivalent of detectron2's Gloo object all_gather (utils/comm.py:88-170).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Sequence[jax.Device] | None = None,
    model_parallel: int = 1,
    axis_names: tuple[str, str] = (DATA_AXIS, MODEL_AXIS),
) -> Mesh:
    """(data, model) mesh over all (or the given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis; rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put every leaf with its batch axis sharded over `data`."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), batch
    )


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
