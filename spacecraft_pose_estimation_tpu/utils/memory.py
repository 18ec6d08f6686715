"""Graceful OOM degradation (utils/memory.py retry_if_cuda_oom analog).

`retry_if_oom(fn)` re-runs the function with successively halved batch
(splitting the leading axis of array args and concatenating results)
when XLA reports RESOURCE_EXHAUSTED — the TPU counterpart of the
reference's retry-on-CPU fallback.
"""

from __future__ import annotations

import functools
import logging
from typing import Callable

import numpy as np

logger = logging.getLogger(__name__)


def _is_oom(err: Exception) -> bool:
    return "RESOURCE_EXHAUSTED" in str(err) or "Out of memory" in str(err)


def retry_if_oom(fn: Callable, max_splits: int = 3) -> Callable:
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except Exception as e:  # jaxlib.xla_extension.XlaRuntimeError
            if not _is_oom(e):
                raise
        import jax.numpy as jnp

        for split in range(1, max_splits + 1):
            parts = 2**split
            logger.warning("OOM: retrying %s with batch split into %d", fn.__name__, parts)
            try:
                lead = None
                for a in args:
                    if hasattr(a, "ndim") and a.ndim >= 1:
                        lead = a.shape[0]
                        break
                if lead is None or lead < parts:
                    raise
                chunks = []
                step = (lead + parts - 1) // parts
                for s in range(0, lead, step):
                    sub = tuple(
                        a[s : s + step] if hasattr(a, "ndim") and a.ndim >= 1 and a.shape[0] == lead else a
                        for a in args
                    )
                    chunks.append(fn(*sub, **kwargs))
                if hasattr(chunks[0], "ndim"):
                    return jnp.concatenate(chunks, axis=0)
                return chunks
            except Exception as e2:
                if not _is_oom(e2):
                    raise
        raise MemoryError(f"{fn.__name__} OOM even after {2**max_splits}-way split")

    return wrapped
