"""Feature Pyramid Network over a ResNet backbone.

Equivalent of detectron2 modeling/backbone/fpn.py:17-212: 1x1 lateral
convs + 3x3 output convs, nearest top-down pathway summed into laterals,
and a LastLevelMaxPool p6. Output levels p2..p6 with strides 4..64.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import upsample_nearest

Dtype = Any


class FPN(nn.Module):
    out_channels: int = 256
    # which backbone levels feed the pyramid. The Faster-RCNN backbone
    # uses res2..res5; RetinaNet/FCOS use res3..res5 (d2
    # build_retinanet_resnet_fpn_backbone) — building the stride-4 p2
    # lateral+output there would be the single most expensive FPN level,
    # discarded.
    in_levels: tuple[str, ...] = ("res2", "res3", "res4", "res5")
    # LastLevelMaxPool p6 (the Faster-RCNN top block); dense detectors
    # build their own learned p6/p7 instead
    last_level_max_pool: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: dict):
        names = sorted(self.in_levels)  # fine -> coarse
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name=f"lateral_{n}")(feats[n])
            for n in names
        ]
        # top-down: start at coarsest
        outs = [None] * len(laterals)
        prev = laterals[-1]
        outs[-1] = prev
        for i in range(len(laterals) - 2, -1, -1):
            prev = laterals[i] + upsample_nearest(prev, 2)
            outs[i] = prev
        results = {}
        for n, o in zip(names, outs):
            p = f"p{int(n[3:])}"  # res3 -> p3
            results[p] = nn.Conv(
                self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                name=f"output_{p}",
            )(o)
        if self.last_level_max_pool:
            # LastLevelMaxPool: p6 = maxpool(p5, k1, s2)
            results["p6"] = nn.max_pool(results["p5"], (1, 1), strides=(2, 2))
        return results


FPN_STRIDES = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64}
