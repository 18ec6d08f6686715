"""Multi-scale domain discriminator for adversarial domain adaptation.

Equivalent of ``lib/models/multi_scale_discriminator.py:69-114``
(resnet34_ms): the four per-scale heatmap outputs are bilinearly
upsampled to the finest resolution, channel-concatenated
(in_channels = NUM_JOINTS * 4), then classified by a CIFAR-style
ResNet-34 (3x3 stem, no maxpool) with global average pooling into
``num_classes`` domain logits.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import BN_EPS, BN_MOMENTUM, BasicBlock, upsample_bilinear

Dtype = Any


class MultiScaleDiscriminator(nn.Module):
    num_classes: int = 2
    stage_blocks: tuple = (3, 4, 6, 3)  # resnet34
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h1, h2, h3, h4, train: bool = False):
        h2 = upsample_bilinear(h2, 2)
        h3 = upsample_bilinear(h3, 4)
        h4 = upsample_bilinear(h4, 8)
        x = jnp.concatenate([h1, h2, h3, h4], axis=-1).astype(self.dtype)

        x = nn.Conv(64, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype, name="stem_bn"
        )(x)
        x = nn.relu(x)

        widths = (64, 128, 256, 512)
        for si, (w, n) in enumerate(zip(widths, self.stage_blocks)):
            for bi in range(n):
                stride = 2 if (si > 0 and bi == 0) else 1
                x = BasicBlock(features=w, stride=stride, dtype=self.dtype, name=f"layer{si + 1}_b{bi}")(
                    x, train
                )

        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="linear")(x)
        return x.astype(jnp.float32)
