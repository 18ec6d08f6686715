"""Multi-host coordination: object/array gather across processes.

Replacement for detectron2's Gloo side-channel gathers (utils/comm.py:
19-170: get_world_size/get_rank/all_gather/gather/reduce_dict used by
evaluators to merge per-rank predictions). Single-process runs degrade
to no-ops exactly like the reference's world_size==1 short-circuit.
"""

from __future__ import annotations

import pickle
from typing import Any

import jax
import numpy as np


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return get_rank() == 0


def all_gather_objects(obj: Any) -> list[Any]:
    """Gather arbitrary picklable objects from every process (comm.py
    all_gather): pickle -> uint8 array -> process_allgather -> unpickle."""
    if get_world_size() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = multihost_utils.process_allgather(np.array([payload.size], np.int64))
    max_size = int(np.max(sizes))
    padded = np.zeros(max_size, np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [
        pickle.loads(gathered[i, : int(sizes[i, 0])].tobytes())
        for i in range(get_world_size())
    ]


def reduce_dict(metrics: dict[str, float], average: bool = True) -> dict[str, float]:
    """Average (or sum) scalar metrics across processes (comm.reduce_dict)."""
    if get_world_size() == 1:
        return dict(metrics)
    from jax.experimental import multihost_utils

    keys = sorted(metrics)
    vec = np.asarray([float(metrics[k]) for k in keys], np.float64)
    all_vals = multihost_utils.process_allgather(vec)
    agg = all_vals.mean(axis=0) if average else all_vals.sum(axis=0)
    return {k: float(v) for k, v in zip(keys, agg)}
