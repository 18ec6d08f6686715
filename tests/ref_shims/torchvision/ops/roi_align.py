"""torchvision.ops.roi_align shim — exact CPU reimplementation.

Semantics per the torchvision kernel the vendored detectron2 wraps
(detectron2/layers/roi_align.py:28-47 documents the aligned=True
half-pixel contract): per bin, average `sampling_ratio`² bilinear
samples (or ceil(roi_size/out_size)² when sampling_ratio == -1), with
the kernel's exact boundary rules (zero outside [-1, size], clamp at
edges). Bilinear interpolation is separable in y and x, so each ROI is
two row-gathers + two column-gathers — no HxW materialization.
"""

import math

import torch


def _axis_samples(start, bin_size, n_bins, grid, size):
    """Sample positions along one axis: (n_bins*grid,) tensor, plus the
    low/high neighbor indices, lerp weights, and validity mask."""
    i = torch.arange(n_bins * grid, dtype=torch.float64)
    pos = start + (torch.div(i, grid, rounding_mode="floor")) * bin_size + (
        (i % grid) + 0.5
    ) * (bin_size / grid)
    valid = (pos >= -1.0) & (pos <= size)
    p = pos.clamp(min=0.0)
    low = p.floor().long()
    at_edge = low >= size - 1
    low = torch.where(at_edge, torch.as_tensor(size - 1), low)
    high = torch.where(at_edge, low, low + 1)
    frac = torch.where(at_edge, torch.zeros_like(p), p - low.to(p.dtype))
    return low, high, frac.to(torch.float32), valid


def roi_align(
    input: torch.Tensor,
    boxes,
    output_size,
    spatial_scale: float = 1.0,
    sampling_ratio: int = -1,
    aligned: bool = False,
) -> torch.Tensor:
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    ph, pw = output_size
    if isinstance(boxes, (list, tuple)):
        rois = torch.cat(
            [
                torch.cat(
                    [torch.full((b.shape[0], 1), i, dtype=b.dtype), b], dim=1
                )
                for i, b in enumerate(boxes)
            ],
            dim=0,
        )
    else:
        rois = boxes
    N, C, H, W = input.shape
    K = rois.shape[0]
    out = input.new_zeros((K, C, ph, pw))
    if K == 0:
        return out

    offset = 0.5 if aligned else 0.0
    r = rois.to(torch.float64)
    bidx = rois[:, 0].long()
    x1 = r[:, 1] * spatial_scale - offset
    y1 = r[:, 2] * spatial_scale - offset
    roi_w = r[:, 3] * spatial_scale - offset - x1
    roi_h = r[:, 4] * spatial_scale - offset - y1
    if not aligned:
        roi_w = roi_w.clamp(min=1.0)
        roi_h = roi_h.clamp(min=1.0)
    bin_w = roi_w / pw
    bin_h = roi_h / ph

    feat = input.float()
    for k in range(K):
        gh = sampling_ratio if sampling_ratio > 0 else int(math.ceil(roi_h[k] / ph))
        gw = sampling_ratio if sampling_ratio > 0 else int(math.ceil(roi_w[k] / pw))
        gh, gw = max(gh, 1), max(gw, 1)
        yl, yh, fy, vy = _axis_samples(y1[k], bin_h[k], ph, gh, H)
        xl, xh, fx, vx = _axis_samples(x1[k], bin_w[k], pw, gw, W)
        img = feat[bidx[k]]  # (C, H, W) view
        # rows: lerp along y -> (C, ph*gh, W), zeroed where y invalid
        rows = img[:, yl, :] * (1.0 - fy)[None, :, None] + img[:, yh, :] * fy[
            None, :, None
        ]
        rows = rows * vy[None, :, None]
        # cols: lerp along x -> (C, ph*gh, pw*gw)
        vals = rows[:, :, xl] * (1.0 - fx)[None, None, :] + rows[:, :, xh] * fx[
            None, None, :
        ]
        vals = vals * vx[None, None, :]
        # average the gh*gw samples of each bin
        out[k] = (
            vals.reshape(C, ph, gh, pw, gw).sum(dim=(2, 4)) / float(gh * gw)
        ).to(out.dtype)
    return out
