"""Serialization helpers — the detectron2 utils/serialize.py
equivalent: PicklableWrapper lets lambda/closure-carrying objects cross
pickle boundaries (multiprocessing dataloader workers, checkpoint
metadata) by routing through cloudpickle.
"""

from __future__ import annotations

import pickle
from typing import Any

import cloudpickle


class PicklableWrapper:
    """Wrap an object so plain pickle works even when the object itself
    only survives cloudpickle (lambdas, local classes). Transparent
    call/attribute proxy, like detectron2's (utils/serialize.py)."""

    def __init__(self, obj: Any):
        while isinstance(obj, PicklableWrapper):
            obj = obj._obj
        self._obj = obj

    def __reduce__(self):
        s = cloudpickle.dumps(self._obj)
        return cloudpickle.loads, (s,)

    def __call__(self, *args, **kwargs):
        return self._obj(*args, **kwargs)

    def __getattr__(self, attr: str):
        if attr not in ("_obj",):
            return getattr(self._obj, attr)
        return getattr(self, attr)


def robust_dumps(obj: Any) -> bytes:
    """pickle if possible (fast, portable), else cloudpickle."""
    try:
        return pickle.dumps(obj)
    except Exception:
        return cloudpickle.dumps(obj)


def robust_loads(data: bytes) -> Any:
    return pickle.loads(data)  # cloudpickle output is pickle-loadable
