"""SimpleBaseline pose network: ResNet trunk + 3 deconvs + heatmap conv.

Equivalent of ``lib/models/pose_resnet.py:103-271``: ResNet-50-style
encoder (7x7 stem, 4 bottleneck stages), three ConvTranspose(k4, s2)
+BN+ReLU layers back to 1/4 resolution, then a final 1x1 conv to
NUM_JOINTS heatmaps.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import BN_EPS, BN_MOMENTUM, Bottleneck, ConvBN

Dtype = Any

_head_init = nn.initializers.normal(stddev=0.001)

RESNET_SPECS = {
    18: ("BASIC", (2, 2, 2, 2)),
    34: ("BASIC", (3, 4, 6, 3)),
    50: ("BOTTLENECK", (3, 4, 6, 3)),
    101: ("BOTTLENECK", (3, 4, 23, 3)),
    152: ("BOTTLENECK", (3, 8, 36, 3)),
}


@dataclasses.dataclass(frozen=True)
class PoseResNetConfig:
    num_joints: int = 17
    depth: int = 50
    num_deconv_layers: int = 3
    deconv_channels: int = 256
    final_conv_kernel: int = 1


class PoseResNet(nn.Module):
    config: PoseResNetConfig = PoseResNetConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .layers import BLOCKS

        cfg = self.config
        block_name, stage_blocks = RESNET_SPECS[cfg.depth]
        blk = BLOCKS[block_name]
        x = x.astype(self.dtype)

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype, name="stem_bn"
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        widths = (64, 128, 256, 512)
        for si, (w, n) in enumerate(zip(widths, stage_blocks)):
            for bi in range(n):
                stride = 2 if (si > 0 and bi == 0) else 1
                x = blk(features=w, stride=stride, dtype=self.dtype, name=f"layer{si + 1}_b{bi}")(x, train)

        for di in range(cfg.num_deconv_layers):
            x = nn.ConvTranspose(
                cfg.deconv_channels,
                (4, 4),
                strides=(2, 2),
                padding="SAME",
                use_bias=False,
                kernel_init=_head_init,
                dtype=self.dtype,
                name=f"deconv{di}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPS,
                dtype=self.dtype,
                name=f"deconv_bn{di}",
            )(x)
            x = nn.relu(x)

        x = nn.Conv(
            cfg.num_joints,
            (cfg.final_conv_kernel, cfg.final_conv_kernel),
            padding="SAME" if cfg.final_conv_kernel > 1 else "VALID",
            kernel_init=_head_init,
            dtype=self.dtype,
            name="final_layer",
        )(x)
        return x.astype(jnp.float32)
