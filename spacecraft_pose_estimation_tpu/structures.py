"""Typed result containers (detectron2 `structures` counterparts).

The framework computes with plain padded arrays; these lightweight
pytree containers give user code the familiar Boxes/Instances surface
(structures/boxes.py, instances.py) without reintroducing ragged data.
`Instances` is a fixed-capacity, mask-validated field bundle that jits
and vmaps as a pytree.
"""

from __future__ import annotations

from typing import Any, Iterator

import jax
import jax.numpy as jnp
from flax import struct

from .ops import boxes as box_ops

Array = jax.Array


class Boxes(struct.PyTreeNode):
    """(N, 4) XYXY boxes with the reference's method surface."""

    tensor: Array

    def area(self) -> Array:
        return box_ops.box_area(self.tensor)

    def clip(self, height: float, width: float) -> "Boxes":
        return Boxes(box_ops.clip_boxes(self.tensor, height, width))

    def nonempty(self, threshold: float = 0.0) -> Array:
        return box_ops.nonempty_mask(self.tensor, threshold)

    def iou(self, other: "Boxes") -> Array:
        return box_ops.pairwise_iou(self.tensor, other.tensor)

    def __len__(self) -> int:
        return self.tensor.shape[0]


class Instances(struct.PyTreeNode):
    """Fixed-capacity per-image predictions: named fields + validity mask.

    Unlike detectron2's dynamic Instances, capacity is static (padded);
    `valid` marks live rows. Fields are stored in a dict pytree so the
    container passes through jit/vmap.
    """

    fields: dict[str, Array]
    valid: Array

    @classmethod
    def create(cls, valid: Array, **fields: Array) -> "Instances":
        n = valid.shape[0]
        for k, v in fields.items():
            if v.shape[0] != n:
                raise ValueError(f"field {k!r} leading dim {v.shape[0]} != {n}")
        return cls(fields=dict(fields), valid=valid)

    def get(self, name: str) -> Array:
        return self.fields[name]

    def has(self, name: str) -> bool:
        return name in self.fields

    def num_instances(self) -> Array:
        return jnp.sum(self.valid)

    def masked(self, name: str, fill=0) -> Array:
        v = self.fields[name]
        mask = self.valid.reshape((-1,) + (1,) * (v.ndim - 1))
        return jnp.where(mask, v, fill)

    def to_numpy(self) -> dict[str, Any]:
        """Strip padding on the host: dict of trimmed numpy arrays."""
        import numpy as np

        keep = np.asarray(self.valid)
        return {k: np.asarray(v)[keep] for k, v in self.fields.items()}


def instances_from_detections(dets: dict) -> list[Instances]:
    """Batched padded detector output -> per-image Instances list."""
    out = []
    b = dets["valid"].shape[0]
    for i in range(b):
        out.append(
            Instances.create(
                dets["valid"][i],
                boxes=dets["boxes"][i],
                scores=dets["scores"][i],
                classes=dets["classes"][i],
            )
        )
    return out
