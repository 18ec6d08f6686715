"""DensePose (chart-based) — TPU-native core.

Semantic contracts from the reference
``projects/DensePose/densepose/`` (file:line cited per item):

* ``DensePoseV1ConvXHead``: N_STACKED_CONVS (8) stacked 3x3 convs of
  CONV_HEAD_DIM (512) channels, ReLU after every conv
  (modeling/roi_heads/v1convx.py:15-61).
* ``DensePoseDeepLabHead``: ASPP(rates 6,12,56) front end then the same
  stacked-conv body with GroupNorm(32) (modeling/roi_heads/deeplab.py:
  15-78); NONLOCAL_ON defaults to 0 and is not replicated.
* ``DensePoseChartPredictor``: four ConvTranspose2d(DECONV_KERNEL=4,
  stride 2, padding k/2-1) heads — coarse segm (K=2 or 15), fine segm /
  U / V (C=NUM_PATCHES+1=25) — each bilinearly upscaled by UP_SCALE=2
  with ``align_corners=False`` (modeling/predictors/chart.py:34-96).
* ``Decoder``: semantic-FPN-style merge of the FPN levels to the
  common stride-4 grid, summed, then a 1x1 to DECODER_NUM_CLASSES
  (modeling/roi_heads/roi_head.py:26-82).
* Chart loss (modeling/losses/chart.py:47-290): smooth-L1 (sum) on U/V
  at annotated points gated to valid foreground points, cross-entropy
  (mean) on fine labels at valid points, cross-entropy (pixel mean) on
  the coarse segmentation grid; point lookups use the exact
  ``_linear_interpolation_utilities`` mapping (losses/utils.py:16-59):
  v = v0_gt + v_norm * size_gt / 256 into the ESTIMATED box grid, with
  the clamp-then-min weight quirk preserved.
* Inference (converters/segm_to_mask.py:34-69,
  converters/chart_output_to_chart_result.py:18-47): labels =
  argmax(fine) * (argmax(coarse) > 0) after bilinear resampling to the
  box, U/V gathered at the winning part label.

TPU-first design: NHWC, fixed shapes everywhere. Annotated points are
packed into flat padded arrays with a validity mask (the reference packs
variable-length per-image lists; here P_max is static so the loss jits
as one graph and the "no data" case degrades to the reference's
zero-valued fake losses through masking instead of a python branch).
Chart inference resamples to a STATIC (h, w) crop grid — box-shaped
results are produced by the host-side exporter, matching the
fixed-shape convention used by the Mask R-CNN paste path.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .point_rend import interpolate_bilinear, upsample_bilinear

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class DensePoseConfig:
    """Defaults mirror densepose/config.py:167-199."""

    num_coarse_segm_channels: int = 2
    num_patches: int = 24
    num_stacked_convs: int = 8
    conv_head_dim: int = 512
    conv_head_kernel: int = 3
    deconv_kernel: int = 4
    up_scale: int = 2
    heatmap_size: int = 112
    index_weights: float = 5.0  # w_segm (coarse)
    part_weights: float = 1.0  # w_part (fine)
    point_regression_weights: float = 0.01  # w_points (U/V)
    decoder_channels: int = 256
    head: str = "v1convx"  # or "deeplab"


class DensePoseChartPredictorOutput(NamedTuple):
    """NHWC pytree twin of structures.DensePoseChartPredictorOutput."""

    coarse_segm: Array  # (N, S, S, K)
    fine_segm: Array  # (N, S, S, C)
    u: Array  # (N, S, S, C)
    v: Array  # (N, S, S, C)


class DensePoseV1ConvXHead(nn.Module):
    """v1convx.py:15-61 — stacked 3x3 conv + ReLU body."""

    config: DensePoseConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.config
        for i in range(cfg.num_stacked_convs):
            x = nn.Conv(
                cfg.conv_head_dim,
                (cfg.conv_head_kernel,) * 2,
                padding="SAME",
                dtype=self.dtype,
                name=f"body_conv_fcn{i + 1}",
            )(x)
            x = nn.relu(x)
        return x


class DensePoseDeepLabHead(nn.Module):
    """deeplab.py:15-78 — ASPP(6,12,56) front end + GN stacked convs."""

    config: DensePoseConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from ..models.extra_layers import ASPP

        cfg = self.config
        x = ASPP(
            features=cfg.conv_head_dim,
            dilations=(6, 12, 56),
            dtype=self.dtype,
            name="aspp",
        )(x)
        for i in range(cfg.num_stacked_convs):
            x = nn.Conv(
                cfg.conv_head_dim,
                (cfg.conv_head_kernel,) * 2,
                padding="SAME",
                use_bias=False,
                dtype=self.dtype,
                name=f"body_conv_fcn{i + 1}",
            )(x)
            x = nn.GroupNorm(num_groups=32, dtype=self.dtype,
                             name=f"gn{i + 1}")(x)
            x = nn.relu(x)
        return x


def _upsample_bilinear(x: Array, factor: int) -> Array:
    """torch F.interpolate(scale_factor, bilinear, align_corners=False)
    — the shared point_rend implementation (one source of truth for the
    torch-interpolate contract)."""
    return upsample_bilinear(x, factor)


class DensePoseChartPredictor(nn.Module):
    """chart.py:34-96: four stride-2 deconv heads + bilinear UP_SCALE."""

    config: DensePoseConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> DensePoseChartPredictorOutput:
        cfg = self.config
        k = cfg.deconv_kernel
        # torch ConvTranspose2d(k, stride=2, padding=k/2-1, out_pad=0)
        # -> XLA conv_transpose explicit padding (k-1-p, k-1-p) = (2, 2)
        # for k=4 (same derivation as models/hrnet.py head deconvs).
        p = k - 1 - (k // 2 - 1)
        pad = ((p, p), (p, p))

        def head(name, channels):
            y = nn.ConvTranspose(
                channels, (k, k), strides=(2, 2), padding=pad,
                dtype=self.dtype, name=name,
            )(x)
            return _upsample_bilinear(y, cfg.up_scale)

        c = cfg.num_patches + 1
        return DensePoseChartPredictorOutput(
            coarse_segm=head("ann_index_lowres", cfg.num_coarse_segm_channels),
            fine_segm=head("index_uv_lowres", c),
            u=head("u_lowres", c),
            v=head("v_lowres", c),
        )


class DensePoseDecoder(nn.Module):
    """roi_head.py:26-82 — merge FPN levels at the common stride-4 grid.

    ``features``: FPN levels ordered fine->coarse (p2..p5), strides
    4*2^i. Each level gets per-step [conv3x3+ReLU, 2x bilinear up] until
    it reaches stride 4 (p2: one conv, no upsample), the merged sum goes
    through a final 1x1 to ``decoder_channels`` classes.
    """

    config: DensePoseConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[Array]) -> Array:
        cfg = self.config
        merged = None
        for i, f in enumerate(features):
            x = f
            for step in range(max(1, i)):
                x = nn.Conv(
                    cfg.decoder_channels, (3, 3), padding="SAME",
                    dtype=self.dtype, name=f"scale_head{i}_conv{step}",
                )(x)
                x = nn.relu(x)
                if i > 0:
                    x = _upsample_bilinear(x, 2)
            merged = x if merged is None else merged + x
        return nn.Conv(
            cfg.decoder_channels, (1, 1), dtype=self.dtype, name="predictor"
        )(merged)


class DensePoseHead(nn.Module):
    """head body + chart predictor (roi_head.py:120-177 wiring)."""

    config: DensePoseConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> DensePoseChartPredictorOutput:
        body = (
            DensePoseDeepLabHead if self.config.head == "deeplab"
            else DensePoseV1ConvXHead
        )(self.config, dtype=self.dtype, name="densepose_head")
        out = body(x)
        return DensePoseChartPredictor(
            self.config, dtype=self.dtype, name="densepose_predictor"
        )(out)


# ---------------------------------------------------------------------------
# ROI integration (roi_head.py:127-177 _forward_densepose)


def densepose_roi_forward(
    head: "DensePoseHead",
    head_variables,
    features: Sequence[Array],
    boxes: Array,
    *,
    decoder: "DensePoseDecoder | None" = None,
    decoder_variables=None,
    pooler_resolution: int = 28,
    strides: tuple[int, ...] = (4, 8, 16, 32),
) -> DensePoseChartPredictorOutput:
    """Pool box features and run the DensePose head, mirroring
    ``DensePoseROIHeads._forward_densepose`` (roi_head.py:127-177):
    with ``decoder`` (DECODER_ON default) the FPN levels are merged to
    one stride-4 map and pooled single-level; otherwise the standard
    multi-level ROIAlign assignment applies. ``boxes``: (R, 4) XYXY in
    image coords, fixed R (padded boxes produce padded outputs —
    validity is the caller's mask, as everywhere in this repo).
    ``features``: one image's FPN maps, batched ``(1, H, W, C)``
    (the GeneralizedRCNN per-image serving contract).
    """
    from ..ops.roi_align import multilevel_roi_align, roi_align

    if decoder is not None:
        merged = decoder.apply(decoder_variables, features)
        pooled = roi_align(
            merged[0], boxes, pooler_resolution, 1.0 / strides[0],
            sampling_ratio=2,
        )
    else:
        pooled = multilevel_roi_align(
            [f[0] for f in features], boxes, pooler_resolution, strides,
            sampling_ratio=2,
        )
    return head.apply(head_variables, pooled)


# ---------------------------------------------------------------------------
# chart loss


class PackedChartAnnotations(NamedTuple):
    """Fixed-shape twin of losses/utils.py packed annotations: flat
    arrays over all annotated points of the batch, padded to P.

    x_gt/y_gt are the reference's 0..256-normalized in-GT-box offsets
    (DensePoseDataRelative convention, losses/utils.py:52).
    ``point_instance`` maps each point to its row in the predictor
    output / bbox arrays; ``point_valid`` masks padding.
    """

    x_gt: Array  # (P,) 0..256 normalized
    y_gt: Array  # (P,)
    u_gt: Array  # (P,)
    v_gt: Array  # (P,)
    fine_segm_labels_gt: Array  # (P,) int 0..C-1
    point_instance: Array  # (P,) int -> instance row
    point_valid: Array  # (P,) bool
    bbox_xywh_gt: Array  # (N, 4)
    bbox_xywh_est: Array  # (N, 4)
    coarse_segm_gt: Array  # (N, Hg, Wg) int labels on the GT-box grid
    instance_valid: Array  # (N,) bool


def resample_data_nearest(
    z: Array, bbox_xywh_src: Array, bbox_xywh_dst: Array,
    out_hw: tuple[int, int],
) -> Array:
    """losses/utils.py:195-235 ``resample_data`` (mode='nearest',
    padding_mode='zeros'): re-express data given on the src-box grid on
    the dst-box grid via grid_sample with ``align_corners=True``.

    z: (N, H, W, C) -> (N, hout, wout, C); out-of-src taps are zero.
    """
    n, h, w, c = z.shape
    hout, wout = out_hw
    x0s, y0s, ws, hs = [bbox_xywh_src[:, i] for i in range(4)]
    x0d, y0d, wd, hd = [bbox_xywh_dst[:, i] for i in range(4)]
    x0n = 2.0 * (x0d - x0s) / ws - 1.0
    y0n = 2.0 * (y0d - y0s) / hs - 1.0
    x1n = 2.0 * (x0d + wd - x0s) / ws - 1.0
    y1n = 2.0 * (y0d + hd - y0s) / hs - 1.0
    gw = jnp.arange(wout, dtype=jnp.float32) / wout
    gh = jnp.arange(hout, dtype=jnp.float32) / hout
    gx = gw[None, None, :] * (x1n - x0n)[:, None, None] + x0n[:, None, None]
    gy = gh[None, :, None] * (y1n - y0n)[:, None, None] + y0n[:, None, None]
    # align_corners=True pixel mapping + nearest (round-half-even, the
    # torch GridSampler convention)
    px = jnp.round((gx + 1.0) * 0.5 * (w - 1))
    py = jnp.round((gy + 1.0) * 0.5 * (h - 1))
    valid = (px >= 0) & (px <= w - 1) & (py >= 0) & (py <= h - 1)
    ix = jnp.clip(px, 0, w - 1).astype(jnp.int32)
    iy = jnp.clip(py, 0, h - 1).astype(jnp.int32)
    bidx = jnp.arange(n)[:, None, None]
    out = z[bidx, iy, ix, :]
    return out * valid[..., None].astype(z.dtype)


def _linear_interpolation_utilities(v_norm, v0_src, size_src, v0_dst,
                                    size_dst, size_z):
    """Exact port of losses/utils.py:16-59 (incl. the clamp-then-min
    weight quirk at the right edge)."""
    v = v0_src + v_norm * size_src / 256.0
    j_valid = (v - v0_dst >= 0) & (v - v0_dst < size_dst)
    v_grid = (v - v0_dst) * size_z / jnp.maximum(size_dst, 1e-12)
    v_lo = jnp.clip(jnp.floor(v_grid), 0, size_z - 1).astype(jnp.int32)
    v_hi = jnp.minimum(v_lo + 1, size_z - 1)
    v_grid = jnp.minimum(v_hi.astype(v_grid.dtype), v_grid)
    v_w = v_grid - v_lo.astype(v_grid.dtype)
    return v_lo, v_hi, v_w, j_valid


def _smooth_l1(x: Array) -> Array:
    """torch F.smooth_l1_loss(beta=1) elementwise."""
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def densepose_chart_loss(
    out: DensePoseChartPredictorOutput,
    ann: PackedChartAnnotations,
    cfg: DensePoseConfig,
) -> dict[str, Array]:
    """losses/chart.py:66-290 as one fixed-shape masked computation.

    Returns loss_densepose_{U,V,I,S}. With zero valid points/instances
    every term is exactly 0 (the reference's fake-loss path,
    chart.py:139-210) — same graph, no python branch.
    """
    s = out.u.shape[1]
    inst = ann.point_instance
    x0g, y0g, wg, hg = [ann.bbox_xywh_gt[inst, i] for i in range(4)]
    x0e, y0e, we, he = [ann.bbox_xywh_est[inst, i] for i in range(4)]
    x_lo, x_hi, x_w, jx = _linear_interpolation_utilities(
        ann.x_gt, x0g, wg, x0e, we, s
    )
    y_lo, y_hi, y_w, jy = _linear_interpolation_utilities(
        ann.y_gt, y0g, hg, y0e, he, s
    )
    j_valid = jx & jy & ann.point_valid
    w00 = (1.0 - x_w) * (1.0 - y_w)
    w01 = x_w * (1.0 - y_w)
    w10 = (1.0 - x_w) * y_w
    w11 = x_w * y_w

    def extract(z, channel):  # z: (N, S, S, C); channel: (P,) or slice
        def tap(ys, xs):
            if channel is None:  # all channels -> (P, C)
                return z[inst, ys, xs, :]
            return z[inst, ys, xs, channel]

        return (
            tap(y_lo, x_lo) * _b(w00, channel)
            + tap(y_lo, x_hi) * _b(w01, channel)
            + tap(y_hi, x_lo) * _b(w10, channel)
            + tap(y_hi, x_hi) * _b(w11, channel)
        )

    def _b(w, channel):
        return w[:, None] if channel is None else w

    fg = j_valid & (ann.fine_segm_labels_gt > 0)
    fgf = fg.astype(jnp.float32)
    label = ann.fine_segm_labels_gt
    u_est = extract(out.u, label)
    v_est = extract(out.v, label)
    loss_u = jnp.sum(_smooth_l1(u_est - ann.u_gt) * fgf)
    loss_v = jnp.sum(_smooth_l1(v_est - ann.v_gt) * fgf)

    # fine segm: CE mean over j_valid points (chart.py:275-283)
    logits = extract(out.fine_segm, None)  # (P, C)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, label[:, None], axis=1)[:, 0]
    jvf = j_valid.astype(jnp.float32)
    loss_i = jnp.sum(ce * jvf) / jnp.maximum(jnp.sum(jvf), 1.0)

    # coarse segm: GT labels live on the GT-box grid; nearest-resample
    # them onto the estimate grid of the EST box (segm.py:55-67 via
    # resample_data), then CE mean over all grid pixels of valid
    # instances; K==2 folds labels to {0,1} (segm.py:65-66)
    k = out.coarse_segm.shape[-1]
    seg_gt = resample_data_nearest(
        ann.coarse_segm_gt[..., None].astype(jnp.float32),
        ann.bbox_xywh_gt, ann.bbox_xywh_est, (s, s),
    )[..., 0].astype(jnp.int32)
    if k == 2:
        seg_gt = (seg_gt > 0).astype(jnp.int32)
    seg_logp = jax.nn.log_softmax(out.coarse_segm, axis=-1)
    seg_ce = -jnp.take_along_axis(seg_logp, seg_gt[..., None], axis=-1)[..., 0]
    ivf = ann.instance_valid.astype(jnp.float32)[:, None, None]
    loss_s = jnp.sum(seg_ce * ivf) / jnp.maximum(
        jnp.sum(ivf) * s * s, 1.0
    )

    any_fg = jnp.any(fg).astype(jnp.float32)
    any_inst = jnp.any(ann.instance_valid).astype(jnp.float32)
    return {
        "loss_densepose_U": loss_u * cfg.point_regression_weights * any_fg,
        "loss_densepose_V": loss_v * cfg.point_regression_weights * any_fg,
        "loss_densepose_I": loss_i * cfg.part_weights * any_fg,
        "loss_densepose_S": loss_s * cfg.index_weights * any_fg * any_inst,
    }


# ---------------------------------------------------------------------------
# inference converters


def chart_result_for_grid(
    out: DensePoseChartPredictorOutput, grid_hw: tuple[int, int]
) -> tuple[Array, Array]:
    """Fixed-shape twin of converters/segm_to_mask.py:34-69 +
    chart_output_to_chart_result.py:18-47: resample to a static
    ``grid_hw`` and derive (labels, uv).

    labels: (N, h, w) int32 = argmax(fine) * (argmax(coarse) > 0);
    uv: (N, h, w, 2) float gathered at the winning part label (0 where
    background — the reference leaves the zero init in place for
    part_id 0, chart_output_to_chart_result.py:43-46).

    The host exporter resizes these crop-grid results to each concrete
    integer box, mirroring the reference's per-box dynamic shapes.
    """
    n, _, _, c = out.fine_segm.shape
    h, w = grid_hw

    def rs(z):
        # torch F.interpolate(bilinear) does NOT antialias on downscale;
        # jax.image.resize('linear') does — use the torch-exact resampler
        return interpolate_bilinear(z, (h, w))

    coarse = jnp.argmax(rs(out.coarse_segm), axis=-1)
    fine = jnp.argmax(rs(out.fine_segm), axis=-1)
    labels = (fine * (coarse > 0)).astype(jnp.int32)
    u = jnp.take_along_axis(rs(out.u), labels[..., None], axis=-1)[..., 0]
    v = jnp.take_along_axis(rs(out.v), labels[..., None], axis=-1)[..., 0]
    keep = (labels > 0).astype(u.dtype)
    uv = jnp.stack([u * keep, v * keep], axis=-1)
    return labels, uv
