"""Extra layer modules: ASPP + simple IoU tracker.

* `ASPP` — atrous spatial pyramid pooling (detectron2 layers/aspp.py):
  parallel 1x1 + three dilated 3x3 convs + image pooling, concatenated
  and projected.
* `IouTracker` — greedy IoU bbox tracker (detectron2 tracking/
  bbox_iou_tracker.py essence): assign detections to existing tracks by
  IoU, spawn new ids for unmatched detections. Host-side, stateful.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn


class ASPP(nn.Module):
    features: int = 256
    dilations: tuple[int, ...] = (6, 12, 18)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        outs = [nn.relu(nn.Conv(self.features, (1, 1), dtype=self.dtype, name="conv1x1")(x))]
        for i, d in enumerate(self.dilations):
            outs.append(
                nn.relu(
                    nn.Conv(
                        self.features, (3, 3), padding=d, kernel_dilation=(d, d),
                        dtype=self.dtype, name=f"atrous{i}",
                    )(x)
                )
            )
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = nn.relu(nn.Conv(self.features, (1, 1), dtype=self.dtype, name="pool_conv")(pooled))
        pooled = jnp.broadcast_to(pooled, (*x.shape[:3], self.features))
        cat = jnp.concatenate(outs + [pooled], axis=-1)
        return nn.relu(nn.Conv(self.features, (1, 1), dtype=self.dtype, name="project")(cat))


class IouTracker:
    """Greedy per-frame IoU association (host-side)."""

    def __init__(self, iou_threshold: float = 0.5, max_missed: int = 5):
        self.iou_threshold = iou_threshold
        self.max_missed = max_missed
        self.tracks: dict[int, dict] = {}
        self._next_id = 0

    def update(self, boxes: np.ndarray, scores: np.ndarray | None = None) -> list[int]:
        """Boxes (N, 4) for the new frame -> per-box track ids."""
        from ..ops.boxes import pairwise_iou

        boxes = np.asarray(boxes, np.float64).reshape(-1, 4)
        ids = [-1] * len(boxes)
        if self.tracks and len(boxes):
            track_ids = list(self.tracks)
            prev = np.stack([self.tracks[t]["box"] for t in track_ids])
            iou = np.asarray(pairwise_iou(jnp.asarray(prev), jnp.asarray(boxes)))
            order = np.argsort(-iou, axis=None)
            used_t, used_d = set(), set()
            for flat in order:
                ti, di = divmod(int(flat), len(boxes))
                if iou[ti, di] < self.iou_threshold:
                    break
                if ti in used_t or di in used_d:
                    continue
                tid = track_ids[ti]
                ids[di] = tid
                self.tracks[tid] = {"box": boxes[di], "missed": 0}
                used_t.add(ti)
                used_d.add(di)
        for di, tid in enumerate(ids):
            if tid == -1:
                ids[di] = self._next_id
                self.tracks[self._next_id] = {"box": boxes[di], "missed": 0}
                self._next_id += 1
        # age out unmatched tracks
        matched = set(ids)
        for tid in list(self.tracks):
            if tid not in matched:
                self.tracks[tid]["missed"] += 1
                if self.tracks[tid]["missed"] > self.max_missed:
                    del self.tracks[tid]
        return ids
