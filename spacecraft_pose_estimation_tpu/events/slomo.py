"""SuperSloMo frame interpolation (v2e/v2ecore/slomo.py + model.py).

Flax implementation of the two-UNet Super SloMo network: a flow-
computation UNet (2 frames -> bidirectional optical flow F01/F10) and an
arbitrary-time flow-interpolation UNet (-> refined flows + visibility
map), plus `backwarp` bilinear warping (model.py:158-348) and the
`interpolate` schedule that upsamples a frame pair into N intermediate
frames (slomo.py:231-360).

Module/layer names mirror the official checkpoint layout
(SuperSloMo39.ckpt: state_dictFC / state_dictAT with conv1/conv2,
down1..down5.conv1/conv2, up1..up5.conv1/conv2, conv3), so
`slomo_torch_to_flax` can import the reference's pretrained weights.

Upsampling-factor selection mirrors v2e's auto mode: choose N so the max
flow magnitude is <= 1 px per interpolated frame.
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def leaky(x):
    return nn.leaky_relu(x, 0.1)


class Down(nn.Module):
    features: int
    kernel: int

    @nn.compact
    def __call__(self, x):
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        k = self.kernel
        x = leaky(nn.Conv(self.features, (k, k), padding=k // 2, name="conv1")(x))
        x = leaky(nn.Conv(self.features, (k, k), padding=k // 2, name="conv2")(x))
        return x


class Up(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, skip):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), "bilinear")
        x = leaky(nn.Conv(self.features, (3, 3), padding=1, name="conv1")(x))
        x = jnp.concatenate([x, skip], axis=-1)
        x = leaky(nn.Conv(self.features, (3, 3), padding=1, name="conv2")(x))
        return x


class UNet(nn.Module):
    """The Super SloMo UNet topology (model.py:229-307)."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        x1 = leaky(nn.Conv(32, (7, 7), padding=3, name="conv1")(x))
        x1 = leaky(nn.Conv(32, (7, 7), padding=3, name="conv2")(x1))
        x2 = Down(64, 5, name="down1")(x1)
        x3 = Down(128, 3, name="down2")(x2)
        x4 = Down(256, 3, name="down3")(x3)
        x5 = Down(512, 3, name="down4")(x4)
        x6 = Down(512, 3, name="down5")(x5)
        u = Up(512, name="up1")(x6, x5)
        u = Up(256, name="up2")(u, x4)
        u = Up(128, name="up3")(u, x3)
        u = Up(64, name="up4")(u, x2)
        u = Up(32, name="up5")(u, x1)
        return leaky(nn.Conv(self.out_channels, (3, 3), padding=1, name="conv3")(u))


def backwarp(img: Array, flow: Array, mode: str = "exact") -> Array:
    """Warp img (B,H,W,C) backwards along flow (B,H,W,2) [u, v].

    mode="exact": sample at (x+u, y+v) with border clamping — the clean
    formulation (zero flow is the identity).

    mode="torch": bit-parity with the reference backWarp
    (v2ecore/model.py:268-300): it normalizes by 2*(x/W - 0.5) and calls
    grid_sample with default align_corners=False + zero padding, which
    actually samples at (x+u-0.5, y+v-0.5) and zeroes out-of-image taps.
    The official SuperSloMo39.ckpt was trained with this sampling, so
    checkpoint inference must use it.
    """
    b, h, w, _ = img.shape
    shift = 0.5 if mode == "torch" else 0.0
    xs = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 2) + flow[..., 0] - shift
    ys = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 1) + flow[..., 1] - shift

    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = (xs - x0)[..., None]
    fy = (ys - y0)[..., None]

    def gather(yi, xi):
        yi_c = jnp.clip(yi.astype(jnp.int32), 0, h - 1)
        xi_c = jnp.clip(xi.astype(jnp.int32), 0, w - 1)
        batch_idx = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 0)
        val = img[batch_idx, yi_c, xi_c]
        if mode == "torch":  # zero padding: drop out-of-image taps
            inside = (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
            val = val * inside[..., None]
        return val

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


class SuperSloMo(nn.Module):
    """Bundled flow-comp + arbitrary-time interpolation networks."""

    @nn.compact
    def __call__(self, frame0: Array, frame1: Array, t: Array,
                 return_flow: bool = False) -> Array:
        """Interpolate at fractional time t in (0, 1). Frames are
        (B, H, W, C) in [0, 1]; C=1 (luma) or 3.

        return_flow=True: return the raw bidirectional flow (..., 4)
        instead (the --auto_timestamp_resolution probe, reference
        slomo.py:231-360 limits flow to <=1 px per interpolated frame)."""
        x = jnp.concatenate([frame0, frame1], axis=-1)
        flow_out = UNet(4, name="flow_comp")(x)
        if return_flow:
            return flow_out
        f01 = flow_out[..., 0:2]
        f10 = flow_out[..., 2:4]

        t = jnp.reshape(t, (-1, 1, 1, 1))
        ft0_hat = -(1 - t) * t * f01 + t * t * f10
        ft1_hat = (1 - t) * (1 - t) * f01 - t * (1 - t) * f10

        # "torch" warp mode: SuperSloMo39.ckpt was trained with the
        # reference's grid_sample sampling (slomo.py:415-426 warper)
        g0 = backwarp(frame0, ft0_hat, mode="torch")
        g1 = backwarp(frame1, ft1_hat, mode="torch")

        interp_in = jnp.concatenate(
            [frame0, frame1, f01, f10, ft1_hat, ft0_hat, g1, g0], axis=-1
        )
        interp_out = UNet(5, name="arb_interp")(interp_in)
        ft0 = interp_out[..., 0:2] + ft0_hat
        ft1 = interp_out[..., 2:4] + ft1_hat
        v0 = jax.nn.sigmoid(interp_out[..., 4:5])
        v1 = 1 - v0

        g0r = backwarp(frame0, ft0, mode="torch")
        g1r = backwarp(frame1, ft1, mode="torch")
        wgt0 = (1 - t) * v0
        wgt1 = t * v1
        return (wgt0 * g0r + wgt1 * g1r) / jnp.maximum(wgt0 + wgt1, 1e-8)


def interpolate_pair(model, variables, frame0: Array, frame1: Array, n: int) -> Array:
    """frame pair -> n frames at the reference's midpoint schedule
    t = (i + 0.5) / n (slomo.py:407: covers [0, 1) so consecutive pairs
    tile the timeline without duplicating the endpoint frames)."""
    ts = (jnp.arange(n) + 0.5) / n

    def one(t):
        return model.apply(variables, frame0, frame1, jnp.full((frame0.shape[0],), t))

    return jax.vmap(one)(ts)  # (n, B, H, W, C)


def auto_upsampling_factor(max_flow_px: Array, limit_px: float = 1.0) -> Array:
    """v2e --auto_timestamp_resolution: interpolate so max flow <= 1 px
    per interpolated frame; the reference clamps the factor to >= 2
    (slomo.py:385-387)."""
    return jnp.maximum(jnp.ceil(max_flow_px / limit_px).astype(jnp.int32), 2)


# ---------------------------------------------------------------------------
# Torch checkpoint import (SuperSloMo39.ckpt)
# ---------------------------------------------------------------------------


def _unet_sd_to_flax(sd: dict[str, Any]) -> dict:
    """One UNet state_dict (conv1/conv2/downK.convJ/upK.convJ/conv3) ->
    flax param subtree."""
    tree: dict = {}

    def put(path, leaf, v):
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = v

    for key, v in sd.items():
        v = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        m = re.match(r"(conv\d)\.(weight|bias)", key)
        if m:
            name, leaf = m.groups()
            put([name], "kernel" if leaf == "weight" else "bias",
                v.transpose(2, 3, 1, 0) if leaf == "weight" else v)
            continue
        m = re.match(r"(down\d|up\d)\.(conv\d)\.(weight|bias)", key)
        if m:
            block, name, leaf = m.groups()
            put([block, name], "kernel" if leaf == "weight" else "bias",
                v.transpose(2, 3, 1, 0) if leaf == "weight" else v)
    return tree


def slomo_torch_to_flax(checkpoint: dict[str, Any]) -> dict:
    """Official SuperSloMo ckpt {'state_dictFC', 'state_dictAT'} -> params
    tree for the bundled `SuperSloMo` module."""
    return {
        "flow_comp": _unet_sd_to_flax(checkpoint["state_dictFC"]),
        "arb_interp": _unet_sd_to_flax(checkpoint["state_dictAT"]),
    }
