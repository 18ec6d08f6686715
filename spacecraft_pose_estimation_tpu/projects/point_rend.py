"""PointRend: point-based mask refinement (TPU-native).

Semantic contract from the reference
``projects/PointRend/point_rend/{point_features,point_head,mask_head,
semantic_seg}.py``:

* ``point_sample`` == ``F.grid_sample(input, 2*coords-1,
  align_corners=False)`` on [0,1]²-normalized coords (zeros padding):
  image position ``x = u*W - 0.5`` (point_features.py:19-42).
* train-time point selection: oversample kP random points, keep the
  top-βP by uncertainty *of the sampled logits* plus (1-β)P fresh
  random points (point_features.py:63-116 — the "crucial" note about
  sampling logits first is preserved).
* inference: adaptive subdivision — upsample 2×, re-predict the N most
  uncertain grid points, scatter back (mask_head.py:302-359).
* uncertainty = -|logit of the (gt/pred) class| (mask_head.py:29-49).
* StandardPointHead: k=1 conv MLP over points, coarse logits
  re-concatenated at every layer (point_head.py:82-131).
* ImplicitPointHead: per-instance MLP parameters predicted by a
  ConvFCHead, optional Fourier positional encoding
  (point_head.py:134-282, mask_head.py:362-435).

TPU-first design: everything is fixed-shape. Instances are padded to R
with a validity mask; point counts P, subdivision steps, and top-k sizes
are static, so the whole head jits as one graph. Point gathers are tiny
(R·P ≪ image pixels) and stay in the XLA gather path; the MLP runs as
(R·P, C) matmuls on the MXU.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


# ---------------------------------------------------------------------------
# point sampling ops


def point_sample(feat: Array, coords: Array) -> Array:
    """Bilinear-sample ``feat`` (N, H, W, C) at ``coords`` (N, P, 2) of
    [0,1]²-normalized (x, y) points -> (N, P, C).

    Matches torch ``grid_sample(..., align_corners=False)`` with zeros
    padding on grid ``2*coords - 1`` (point_features.py:19-42): the pixel
    position is ``u*W - 0.5``; out-of-image taps contribute zero.
    """
    n, h, w, _ = feat.shape
    xs = coords[..., 0] * w - 0.5  # (N, P)
    ys = coords[..., 1] * h - 0.5

    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = (xs - x0)[..., None]
    fy = (ys - y0)[..., None]

    bidx = jax.lax.broadcasted_iota(jnp.int32, xs.shape, 0)

    def tap(yi, xi):
        yc = jnp.clip(yi.astype(jnp.int32), 0, h - 1)
        xc = jnp.clip(xi.astype(jnp.int32), 0, w - 1)
        val = feat[bidx, yc, xc]  # (N, P, C)
        inside = (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
        return val * inside[..., None]

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def point_sample_nearest(feat: Array, coords: Array) -> Array:
    """Nearest-neighbour variant (mode="nearest"), used for gt targets
    (semantic_seg.py:92-99). torch rounds the continuous position."""
    n, h, w, _ = feat.shape
    xs = jnp.round(coords[..., 0] * w - 0.5).astype(jnp.int32)
    ys = jnp.round(coords[..., 1] * h - 0.5).astype(jnp.int32)
    bidx = jax.lax.broadcasted_iota(jnp.int32, xs.shape, 0)
    return feat[bidx, jnp.clip(ys, 0, h - 1), jnp.clip(xs, 0, w - 1)]


def regular_grid_coords(r: int, side: int) -> Array:
    """(R, side², 2) regular grid of [0,1]² points, cell-centered
    (point_features.py:45-60: affine_grid of the 0.5-scale transform)."""
    step = 1.0 / side
    ax = (jnp.arange(side, dtype=jnp.float32) + 0.5) * step
    gy, gx = jnp.meshgrid(ax, ax, indexing="ij")
    grid = jnp.stack([gx.ravel(), gy.ravel()], axis=-1)  # (side², 2) as (x, y)
    return jnp.broadcast_to(grid[None], (r, side * side, 2))


def calculate_uncertainty(logits: Array, classes: Array | None = None) -> Array:
    """-|logit of the foreground class| (mask_head.py:29-49).

    logits: (R, ..., C) channels-LAST. classes: (R,) int or None for
    class-agnostic (C==1). Returns (R, ..., 1).
    """
    if logits.shape[-1] == 1:
        fg = logits[..., 0]
    else:
        fg = jnp.take_along_axis(
            logits,
            classes.reshape(classes.shape[0], *([1] * (logits.ndim - 1))).astype(
                jnp.int32
            ),
            axis=-1,
        )[..., 0]
    return -jnp.abs(fg)[..., None]


def sem_seg_uncertainty(logits: Array) -> Array:
    """Semantic-seg uncertainty: (2nd-best − best) logit
    (semantic_seg.py:19-33). logits (N, ..., C) -> (N, ..., 1)."""
    top2, _ = jax.lax.top_k(logits, 2)
    return (top2[..., 1] - top2[..., 0])[..., None]


def uncertain_point_coords_with_randomness(
    rng: Array,
    coarse_logits: Array,  # (R, Hm, Wm, C)
    classes: Array | None,
    num_points: int,
    oversample_ratio: float,
    importance_sample_ratio: float,
    uncertainty_fn=None,
) -> Array:
    """Train-time biased point selection (point_features.py:63-116).

    Samples ``num_points * oversample_ratio`` uniform points, keeps the
    ``importance_sample_ratio`` fraction with the highest uncertainty of
    the *sampled* logits, tops up with fresh uniform points. Fixed
    shapes; returns (R, num_points, 2). ``uncertainty_fn`` defaults to
    the instance-seg -|fg logit|; the semseg head passes
    ``sem_seg_uncertainty``.
    """
    r = coarse_logits.shape[0]
    num_sampled = int(num_points * oversample_ratio)
    k_unc = int(importance_sample_ratio * num_points)
    k_rand = num_points - k_unc
    rng1, rng2 = jax.random.split(rng)
    cand = jax.random.uniform(rng1, (r, num_sampled, 2))
    logits = point_sample(coarse_logits, cand)  # (R, S, C)
    if uncertainty_fn is None:
        unc = calculate_uncertainty(logits, classes)[..., 0]  # (R, S)
    else:
        unc = uncertainty_fn(logits)[..., 0]
    _, idx = jax.lax.top_k(unc, k_unc)
    picked = jnp.take_along_axis(cand, idx[..., None], axis=1)
    if k_rand > 0:
        fresh = jax.random.uniform(rng2, (r, k_rand, 2))
        picked = jnp.concatenate([picked, fresh], axis=1)
    return picked


def uncertain_point_coords_on_grid(
    uncertainty_map: Array, num_points: int
) -> tuple[Array, Array]:
    """Top-``num_points`` grid cells of a (R, H, W, 1) uncertainty map ->
    (indices (R, P) into H*W, coords (R, P, 2) cell-centered)
    (point_features.py:119-143)."""
    r, h, w, _ = uncertainty_map.shape
    num_points = min(h * w, num_points)
    flat = uncertainty_map.reshape(r, h * w)
    _, idx = jax.lax.top_k(flat, num_points)
    xs = (idx % w).astype(jnp.float32) * (1.0 / w) + 0.5 / w
    ys = (idx // w).astype(jnp.float32) * (1.0 / h) + 0.5 / h
    return idx, jnp.stack([xs, ys], axis=-1)


def point_coords_wrt_image(boxes: Array, coords: Array) -> Array:
    """Box-normalized [0,1]² -> image-pixel coordinates
    (point_features.py:192-216). boxes (R, 4) xyxy, coords (R, P, 2)."""
    wh = boxes[:, None, 2:4] - boxes[:, None, 0:2]
    return coords * wh + boxes[:, None, 0:2]


def sample_fine_grained_features(
    feats: Sequence[Array],  # per-level (H, W, C) maps of ONE image
    strides: Sequence[int],
    boxes: Array,  # (R, 4) xyxy image coords
    coords: Array,  # (R, P, 2) box-normalized
) -> Array:
    """Concat of per-level point samples at image-level positions
    (point_features.py:146-189) -> (R, P, sum C). Single-image; vmap for
    a batch."""
    img_pts = point_coords_wrt_image(boxes, coords)  # (R, P, 2) pixels
    outs = []
    for f, s in zip(feats, strides):
        h, w = f.shape[0], f.shape[1]
        norm = img_pts / (jnp.asarray([w, h], jnp.float32) * s)
        outs.append(point_sample(jnp.broadcast_to(f[None], (boxes.shape[0],) + f.shape), norm))
    return jnp.concatenate(outs, axis=-1)


def interpolate_bilinear(x: Array, out_hw: tuple[int, int]) -> Array:
    """torch ``F.interpolate(size=out_hw, mode='bilinear',
    align_corners=False, antialias=False)`` on (N, H, W, C): plain 2-tap
    bilinear at half-pixel centers in BOTH directions. NOT
    ``jax.image.resize('linear')``, which widens the triangle filter
    (antialiases) whenever the target is smaller than the source."""
    n, h, w, c = x.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    # torch clamps the source position to >= 0 (area_pixel_compute_
    # source_index with align_corners=False); the upper edge is handled
    # by index clamping below.
    ys = jnp.maximum(
        (jnp.arange(oh, dtype=jnp.float32) + 0.5) * (h / oh) - 0.5, 0.0
    )
    xs = jnp.maximum(
        (jnp.arange(ow, dtype=jnp.float32) + 0.5) * (w / ow) - 0.5, 0.0
    )
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    fy = (ys - y0)[None, :, None, None]
    fx = (xs - x0)[None, None, :, None]
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    top = x[:, y0i][:, :, x0i] * (1 - fx) + x[:, y0i][:, :, x1i] * fx
    bot = x[:, y1i][:, :, x0i] * (1 - fx) + x[:, y1i][:, :, x1i] * fx
    return top * (1 - fy) + bot * fy


def upsample_bilinear(x: Array, factor: int = 2) -> Array:
    """Integer-factor bilinear upsample, align_corners=False (torch
    F.interpolate semantics: target pixel i samples source
    (i+0.5)/factor - 0.5)."""
    return interpolate_bilinear(x, (x.shape[1] * factor, x.shape[2] * factor))


def upsample2x_bilinear(x: Array) -> Array:
    return upsample_bilinear(x, 2)


# ---------------------------------------------------------------------------
# heads


class StandardPointHead(nn.Module):
    """k=1 conv MLP over per-point features; coarse logits concatenated
    to every layer's input (point_head.py:82-131). Input features are
    channels-last (R, P, C)."""

    num_classes: int = 1
    fc_dim: int = 256
    num_fc: int = 3
    cls_agnostic: bool = True
    coarse_pred_each_layer: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fine: Array, coarse: Array) -> Array:
        x = jnp.concatenate([fine, coarse], axis=-1)
        for k in range(self.num_fc):
            x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name=f"fc{k + 1}")(x))
            if self.coarse_pred_each_layer:
                x = jnp.concatenate([x, coarse], axis=-1)
        out = 1 if self.cls_agnostic else self.num_classes
        return nn.Dense(
            out,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.001),
            name="predictor",
        )(x)


class ConvFCHead(nn.Module):
    """Coarse mask head: 1x1 channel-reduce -> 2x2/s2 spatial-reduce ->
    FC stack -> flat prediction reshaped to ``output_shape``
    (mask_head.py:52-145)."""

    output_shape: tuple[int, ...] = (7, 7, 1)  # (H, W, C) or (num_params,)
    conv_dim: int = 256
    fc_dims: tuple[int, ...] = (1024, 1024)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:  # (R, P, P, C)
        if x.shape[-1] > self.conv_dim:
            x = nn.relu(
                nn.Conv(self.conv_dim, (1, 1), dtype=self.dtype, name="reduce_c")(x)
            )
        x = nn.relu(
            nn.Conv(
                self.conv_dim,
                (2, 2),
                strides=(2, 2),
                padding="VALID",
                dtype=self.dtype,
                name="reduce_s",
            )(x)
        )
        x = x.reshape(x.shape[0], -1)
        for k, d in enumerate(self.fc_dims):
            x = nn.relu(nn.Dense(d, dtype=self.dtype, name=f"fc{k + 1}")(x))
        out = 1
        for s in self.output_shape:
            out *= s
        x = nn.Dense(
            out,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.001),
            name="prediction",
        )(x)
        return x.reshape((x.shape[0],) + tuple(self.output_shape))


class ImplicitPointHead(nn.Module):
    """Per-instance dynamic MLP: weights come from ``parameters`` (one
    flat vector per instance), optional Fourier positional encoding
    (point_head.py:134-282)."""

    num_classes: int = 1
    channels: int = 256
    num_layers: int = 3  # NUM_FC + 1
    in_channels: int = 256  # fine-grained feature channels (0 if disabled)
    image_feature_enabled: bool = True
    positional_encoding_enabled: bool = True

    def setup(self):
        cin = self.in_channels if self.image_feature_enabled else 0
        if self.positional_encoding_enabled:
            cin += 256
            # fixed random-features matrix: the reference register_buffer's
            # torch.randn((2,128)) (point_head.py:177) — a non-trainable
            # buffer, so it must NOT live in the params collection where
            # the optimizer would update it
            self.pos_matrix_var = self.variable(
                "buffers",
                "positional_encoding_gaussian_matrix",
                lambda: jax.random.normal(jax.random.PRNGKey(17), (2, 128)),
            )
        self._cin = cin
        ws, bs = [], []
        for layer in range(self.num_layers):
            ci = cin if layer == 0 else self.channels
            co = self.num_classes if layer == self.num_layers - 1 else self.channels
            ws.append(ci * co)
            bs.append(co)
        self.num_weight_params = tuple(ws)
        self.num_bias_params = tuple(bs)
        self.num_params = sum(ws) + sum(bs)

    def __call__(self, fine: Array, coords: Array, parameters: Array) -> Array:
        """fine (R, P, Cf), coords (R, P, 2), parameters (R, num_params)
        -> (R, P, num_classes)."""
        r, p = fine.shape[0], fine.shape[1]
        if self.positional_encoding_enabled:
            loc = (2.0 * coords - 1.0) @ self.pos_matrix_var.value  # (R, P, 128)
            loc = 2.0 * jnp.pi * loc
            loc = jnp.concatenate([jnp.sin(loc), jnp.cos(loc)], axis=-1)
            fine = loc if not self.image_feature_enabled else jnp.concatenate(
                [loc, fine], axis=-1
            )
        x = fine  # (R, P, cin)
        off = 0
        ws, bs = [], []
        for layer in range(self.num_layers):
            ci = self._cin if layer == 0 else self.channels
            co = (
                self.num_classes
                if layer == self.num_layers - 1
                else self.channels
            )
            ws.append(parameters[:, off : off + ci * co].reshape(r, co, ci))
            off += ci * co
        for layer in range(self.num_layers):
            co = (
                self.num_classes
                if layer == self.num_layers - 1
                else self.channels
            )
            bs.append(parameters[:, off : off + co].reshape(r, 1, co))
            off += co
        for i, (w, b) in enumerate(zip(ws, bs)):
            x = jnp.einsum("rpc,rdc->rpd", x, w) + b
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


# ---------------------------------------------------------------------------
# losses


def roi_mask_point_loss(
    point_logits: Array,  # (R, P, C) or (R, P, 1)
    point_labels: Array,  # (R, P) in {0, 1}, -1 = ignore
    gt_classes: Array | None,
    valid: Array | None = None,  # (R,) instance mask
) -> Array:
    """Point BCE with -1-ignore semantics (point_head.py:20-78), masked
    over padded instances."""
    if point_logits.shape[-1] == 1:
        logits = point_logits[..., 0]
    else:
        logits = jnp.take_along_axis(
            point_logits, gt_classes[:, None, None].astype(jnp.int32), axis=-1
        )[..., 0]
    labels = point_labels.astype(jnp.float32)
    weight = (point_labels != -1).astype(jnp.float32)
    if valid is not None:
        weight = weight * valid[:, None].astype(jnp.float32)
    per = jnp.maximum(logits, 0) - logits * jnp.clip(labels, 0, 1) + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    # reference: BCE(weight=~ignore, reduction="mean") — mean over ALL
    # R*P elements (ignored points contribute 0 to the numerator but
    # stay in the denominator). With padding, R = number of VALID rows.
    p = point_labels.shape[1]
    rows = (
        jnp.sum(valid.astype(jnp.float32))
        if valid is not None
        else jnp.float32(point_labels.shape[0])
    )
    return jnp.sum(per * weight) / jnp.maximum(rows * p, 1.0)


def sem_seg_point_loss(
    point_logits: Array,  # (N, P, C)
    point_targets: Array,  # (N, P) int labels
    ignore_value: int = 255,
) -> Array:
    """Cross-entropy over sampled points with ignore_index
    (semantic_seg.py:100-103)."""
    valid = point_targets != ignore_value
    tgt = jnp.where(valid, point_targets, 0)
    logp = jax.nn.log_softmax(point_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[..., None].astype(jnp.int32), axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


# ---------------------------------------------------------------------------
# mask head (single-image fixed-R; vmap over the batch)


@dataclasses.dataclass(frozen=True)
class PointRendConfig:
    num_classes: int = 1
    cls_agnostic: bool = True
    coarse_resolution: int = 14  # ROI_MASK_HEAD.POOLER_RESOLUTION
    coarse_output_side: int = 7  # OUTPUT_SIDE_RESOLUTION
    train_num_points: int = 14 * 14
    oversample_ratio: float = 3.0
    importance_sample_ratio: float = 0.75
    subdivision_steps: int = 5
    subdivision_num_points: int = 28 * 28
    point_in_strides: tuple[int, ...] = (4,)  # p2
    coarse_in_strides: tuple[int, ...] = (4,)
    fc_dim: int = 256
    num_fc: int = 3

    @property
    def init_resolution(self) -> int:
        """Skip-useless-subdivision optimization (mask_head.py:210-217)."""
        res, steps = self.coarse_output_side, self.subdivision_steps
        while 4 * res * res <= self.subdivision_num_points and steps > 0:
            res *= 2
            steps -= 1
        return res

    @property
    def effective_steps(self) -> int:
        res, steps = self.coarse_output_side, self.subdivision_steps
        while 4 * res * res <= self.subdivision_num_points and steps > 0:
            res *= 2
            steps -= 1
        return steps


class PointRendMaskHead(nn.Module):
    """Coarse ConvFC mask head + point-refinement head
    (mask_head.py:167-359). Operates on ONE image's fixed-R padded
    boxes; vmap over images.

    Train: ``__call__(feats, boxes, gt_masks, gt_classes, valid, rng,
    train=True)`` -> (coarse_logits, point_logits, point_labels).
    Inference: -> (R, M, M, C) refined mask logits via adaptive
    subdivision with static step count.
    """

    cfg: PointRendConfig = PointRendConfig()
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        out_c = 1 if c.cls_agnostic else c.num_classes
        self.coarse_head = ConvFCHead(
            output_shape=(c.coarse_output_side, c.coarse_output_side, out_c),
            dtype=self.dtype,
        )
        self.point_head = StandardPointHead(
            num_classes=c.num_classes,
            fc_dim=c.fc_dim,
            num_fc=c.num_fc,
            cls_agnostic=c.cls_agnostic,
            dtype=self.dtype,
        )

    def _pool(self, feats, boxes):
        """RoI pooling by regular-grid point sampling == RoIAlign with
        sampling_ratio=1 (mask_head.py:245-267)."""
        c = self.cfg
        r = boxes.shape[0]
        grid = regular_grid_coords(r, c.coarse_resolution)
        pooled = sample_fine_grained_features(
            feats, c.coarse_in_strides, boxes, grid
        )
        return pooled.reshape(
            r, c.coarse_resolution, c.coarse_resolution, pooled.shape[-1]
        )

    def __call__(
        self,
        feats: Sequence[Array],  # per-level (H, W, C), strides cfg.point_in_strides
        boxes: Array,  # (R, 4) xyxy
        gt_masks: Array | None = None,  # (R, Hi, Wi) bitmasks (train)
        gt_classes: Array | None = None,  # (R,)
        valid: Array | None = None,  # (R,)
        rng: Array | None = None,
        train: bool = False,
    ):
        c = self.cfg
        coarse = self.coarse_head(self._pool(feats, boxes))  # (R, S, S, C)
        if train:
            coords = uncertain_point_coords_with_randomness(
                rng,
                jax.lax.stop_gradient(coarse),
                gt_classes,
                c.train_num_points,
                c.oversample_ratio,
                c.importance_sample_ratio,
            )
            fine = sample_fine_grained_features(
                feats, c.point_in_strides, boxes, coords
            )
            coarse_at = point_sample(coarse, coords)
            point_logits = self.point_head(fine, coarse_at)
            img_pts = point_coords_wrt_image(boxes, coords)  # pixels
            h, w = gt_masks.shape[1], gt_masks.shape[2]
            norm = img_pts / jnp.asarray([w, h], jnp.float32)
            point_labels = (
                point_sample(gt_masks[..., None].astype(jnp.float32), norm)[..., 0]
            )
            return coarse, point_logits, point_labels
        return self._subdivide(feats, boxes, coarse, gt_classes)

    def _subdivide(self, feats, boxes, coarse, classes):
        """Adaptive subdivision inference (mask_head.py:302-359)."""
        c = self.cfg
        r = boxes.shape[0]
        # initial regular grid at init_resolution
        res = c.init_resolution
        grid = regular_grid_coords(r, res)
        fine = sample_fine_grained_features(feats, c.point_in_strides, boxes, grid)
        logits = self.point_head(fine, point_sample(coarse, grid))
        mask = logits.reshape(r, res, res, -1)
        for _ in range(c.effective_steps):
            mask = upsample2x_bilinear(mask)
            unc = calculate_uncertainty(mask, classes)
            idx, coords = uncertain_point_coords_on_grid(
                unc, c.subdivision_num_points
            )
            fine = sample_fine_grained_features(
                feats, c.point_in_strides, boxes, coords
            )
            pts = self.point_head(fine, point_sample(coarse, coords))
            h, w, ch = mask.shape[1], mask.shape[2], mask.shape[3]
            flat = mask.reshape(r, h * w, ch)
            ridx = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 0)
            flat = flat.at[ridx, idx].set(pts)
            mask = flat.reshape(r, h, w, ch)
        return mask


class ImplicitPointRendMaskHead(nn.Module):
    """Implicit PointRend: a ConvFCHead predicts per-instance MLP
    parameters; the point head evaluates that MLP at query points
    (mask_head.py:362-435). Train returns (point_logits, point_labels,
    l2); inference runs the same subdivision loop."""

    cfg: PointRendConfig = PointRendConfig()
    in_channels: int = 256
    params_l2: float = 0.00001
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.point_head = ImplicitPointHead(
            num_classes=1 if c.cls_agnostic else c.num_classes,
            channels=c.fc_dim,
            num_layers=c.num_fc + 1,
            in_channels=self.in_channels,
        )
        self.parameter_head = ConvFCHead(
            output_shape=(self.point_head.num_params,), dtype=self.dtype
        )

    def _pool(self, feats, boxes):
        c = self.cfg
        r = boxes.shape[0]
        grid = regular_grid_coords(r, c.coarse_resolution)
        pooled = sample_fine_grained_features(feats, c.coarse_in_strides, boxes, grid)
        return pooled.reshape(
            r, c.coarse_resolution, c.coarse_resolution, pooled.shape[-1]
        )

    def __call__(self, feats, boxes, gt_masks=None, valid=None, rng=None,
                 train: bool = False, classes=None):
        c = self.cfg
        if not train and not c.cls_agnostic and c.num_classes > 1 and classes is None:
            # the reference passes pred_classes into _subdivision_inference
            raise ValueError(
                "ImplicitPointRendMaskHead inference with cls_agnostic=False "
                "needs per-instance `classes` to select the foreground channel"
            )
        params = self.parameter_head(self._pool(feats, boxes))  # (R, num_params)
        if train:
            coords = jax.random.uniform(
                rng, (boxes.shape[0], c.train_num_points, 2)
            )
            fine = sample_fine_grained_features(feats, c.point_in_strides, boxes, coords)
            logits = self.point_head(fine, coords, params)
            img_pts = point_coords_wrt_image(boxes, coords)
            h, w = gt_masks.shape[1], gt_masks.shape[2]
            labels = point_sample(
                gt_masks[..., None].astype(jnp.float32),
                img_pts / jnp.asarray([w, h], jnp.float32),
            )[..., 0]
            l2 = self.params_l2 * jnp.mean(params**2)
            return logits, labels, l2
        # subdivision with the implicit head: start at sqrt(P) grid
        import math

        res = int(math.isqrt(c.subdivision_num_points))
        r = boxes.shape[0]
        grid = regular_grid_coords(r, res)
        fine = sample_fine_grained_features(feats, c.point_in_strides, boxes, grid)
        logits = self.point_head(fine, grid, params)
        mask = logits.reshape(r, res, res, -1)
        for _ in range(c.subdivision_steps):
            mask = upsample2x_bilinear(mask)
            unc = calculate_uncertainty(mask, classes)
            idx, coords = uncertain_point_coords_on_grid(unc, c.subdivision_num_points)
            fine = sample_fine_grained_features(feats, c.point_in_strides, boxes, coords)
            pts = self.point_head(fine, coords, params)
            h, w, ch = mask.shape[1], mask.shape[2], mask.shape[3]
            flat = mask.reshape(r, h * w, ch)
            ridx = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 0)
            flat = flat.at[ridx, idx].set(pts)
            mask = flat.reshape(r, h, w, ch)
        return mask


# ---------------------------------------------------------------------------
# semantic-seg variant


class PointRendSemSegHead(nn.Module):
    """Wraps a coarse semantic-seg head with point refinement
    (semantic_seg.py:35-135). ``coarse_fn`` is any callable returning
    (N, H, W, num_classes) logits from the feature dict."""

    num_classes: int
    in_strides: tuple[int, ...] = (4,)
    train_num_points: int = 2048
    oversample_ratio: float = 3.0
    importance_sample_ratio: float = 0.75
    subdivision_steps: int = 2
    subdivision_num_points: int = 8192
    ignore_value: int = 255
    fc_dim: int = 256
    num_fc: int = 3
    dtype: Any = jnp.float32

    def setup(self):
        self.point_head = StandardPointHead(
            num_classes=self.num_classes,
            fc_dim=self.fc_dim,
            num_fc=self.num_fc,
            cls_agnostic=False,
            dtype=self.dtype,
        )

    def __call__(self, coarse_logits, fine_feats, targets=None, rng=None,
                 train: bool = False):
        """coarse_logits (N, Hc, Wc, C); fine_feats: list of (N, H, W, Cf)
        maps at ``in_strides``. Points are image-normalized here (the
        semseg variant has no boxes)."""
        if train:
            coords = uncertain_point_coords_with_randomness(
                rng,
                jax.lax.stop_gradient(coarse_logits),
                None,
                self.train_num_points,
                self.oversample_ratio,
                self.importance_sample_ratio,
                uncertainty_fn=sem_seg_uncertainty,
            )
            fine = jnp.concatenate(
                [point_sample(f, coords) for f in fine_feats], axis=-1
            )
            logits = self.point_head(fine, point_sample(coarse_logits, coords))
            tgt = point_sample_nearest(
                targets[..., None].astype(jnp.float32), coords
            )[..., 0].astype(jnp.int32)
            loss = sem_seg_point_loss(logits, tgt, self.ignore_value)
            return None, loss
        sem = coarse_logits
        for _ in range(self.subdivision_steps):
            sem = upsample2x_bilinear(sem)
            unc = sem_seg_uncertainty(sem)
            idx, coords = uncertain_point_coords_on_grid(
                unc, self.subdivision_num_points
            )
            fine = jnp.concatenate(
                [point_sample(f, coords) for f in fine_feats], axis=-1
            )
            pts = self.point_head(fine, point_sample(coarse_logits, coords))
            n, h, w, ch = sem.shape
            flat = sem.reshape(n, h * w, ch)
            ridx = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 0)
            flat = flat.at[ridx, idx].set(pts)
            sem = flat.reshape(n, h, w, ch)
        return sem, None
