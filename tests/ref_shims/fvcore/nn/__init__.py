"""fvcore.nn shim: the losses + counters the vendored detectron2
imports at module level. Loss semantics per the detectron2 call sites
(box_regression.py smooth-l1/giou, retinanet/fcos focal loss)."""

import torch

from . import weight_init  # noqa: F401
from .distributed import differentiable_all_reduce  # noqa: F401
from .precise_bn import get_bn_modules, update_bn_stats  # noqa: F401


def smooth_l1_loss(
    input: torch.Tensor, target: torch.Tensor, beta: float, reduction: str = "none"
) -> torch.Tensor:
    if beta < 1e-5:
        loss = torch.abs(input - target)
    else:
        n = torch.abs(input - target)
        cond = n < beta
        loss = torch.where(cond, 0.5 * n ** 2 / beta, n - 0.5 * beta)
    if reduction == "mean":
        loss = loss.mean() if loss.numel() > 0 else 0.0 * loss.sum()
    elif reduction == "sum":
        loss = loss.sum()
    return loss


def giou_loss(
    boxes1: torch.Tensor, boxes2: torch.Tensor, reduction: str = "none", eps: float = 1e-7
) -> torch.Tensor:
    x1, y1, x2, y2 = boxes1.unbind(dim=-1)
    x1g, y1g, x2g, y2g = boxes2.unbind(dim=-1)

    xkis1 = torch.max(x1, x1g)
    ykis1 = torch.max(y1, y1g)
    xkis2 = torch.min(x2, x2g)
    ykis2 = torch.min(y2, y2g)

    intsctk = torch.zeros_like(x1)
    mask = (ykis2 > ykis1) & (xkis2 > xkis1)
    intsctk[mask] = (xkis2[mask] - xkis1[mask]) * (ykis2[mask] - ykis1[mask])
    unionk = (x2 - x1) * (y2 - y1) + (x2g - x1g) * (y2g - y1g) - intsctk
    iouk = intsctk / (unionk + eps)

    xc1 = torch.min(x1, x1g)
    yc1 = torch.min(y1, y1g)
    xc2 = torch.max(x2, x2g)
    yc2 = torch.max(y2, y2g)
    area_c = (xc2 - xc1) * (yc2 - yc1)
    miouk = iouk - ((area_c - unionk) / (area_c + eps))
    loss = 1 - miouk
    if reduction == "mean":
        loss = loss.mean() if loss.numel() > 0 else 0.0 * loss.sum()
    elif reduction == "sum":
        loss = loss.sum()
    return loss


def sigmoid_focal_loss(
    inputs: torch.Tensor,
    targets: torch.Tensor,
    alpha: float = -1,
    gamma: float = 2,
    reduction: str = "none",
) -> torch.Tensor:
    p = torch.sigmoid(inputs)
    ce_loss = torch.nn.functional.binary_cross_entropy_with_logits(
        inputs, targets, reduction="none"
    )
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce_loss * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    if reduction == "mean":
        loss = loss.mean()
    elif reduction == "sum":
        loss = loss.sum()
    return loss


sigmoid_focal_loss_jit = sigmoid_focal_loss
sigmoid_focal_loss_star = sigmoid_focal_loss
sigmoid_focal_loss_star_jit = sigmoid_focal_loss


def parameter_count(model: torch.nn.Module):
    from collections import defaultdict

    counts = defaultdict(int)
    for name, prm in model.named_parameters():
        size = prm.numel()
        counts[""] += size
        parts = name.split(".")
        for k in range(1, len(parts) + 1):
            counts[".".join(parts[:k])] += size
    return counts


def parameter_count_table(model: torch.nn.Module, max_depth: int = 3) -> str:
    counts = parameter_count(model)
    return "\n".join(f"{k or 'model'}: {v}" for k, v in sorted(counts.items()))


def flop_count(model, inputs, supported_ops=None):
    raise NotImplementedError("flop_count is out of the oracle shim's scope")


def activation_count(model, inputs, supported_ops=None):
    raise NotImplementedError("activation_count is out of the oracle shim's scope")


class FlopCountAnalysis:  # imported by detectron2/utils/analysis.py
    def __init__(self, model, inputs):
        raise NotImplementedError("FlopCountAnalysis is out of the oracle shim's scope")
