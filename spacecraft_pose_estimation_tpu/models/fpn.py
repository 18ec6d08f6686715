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
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: dict):
        # feats: {res2, res3, res4, res5}, fine -> coarse
        names = sorted(feats.keys())  # res2..res5
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
        results = {
            f"p{i + 2}": nn.Conv(
                self.out_channels, (3, 3), padding=1, dtype=self.dtype, name=f"output_p{i + 2}"
            )(outs[i])
            for i in range(len(outs))
        }
        # LastLevelMaxPool: p6 = maxpool(p5, k1, s2)
        results["p6"] = nn.max_pool(results["p5"], (1, 1), strides=(2, 2))
        return results


FPN_STRIDES = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64}
