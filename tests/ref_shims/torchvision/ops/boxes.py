"""torchvision.ops.boxes shim: greedy NMS + the coordinate-offset
batched_nms, matching torchvision semantics (detectron2 layers/nms.py:9
calls box_ops.batched_nms on the RPN + ROI-heads hot path).

Greedy NMS contract: boxes (N,4) x1y1x2y2, scores (N,) -> LongTensor of
kept indices in decreasing-score order; IoU uses exclusive areas
(x2-x1)*(y2-y1) with no +1."""

import torch


def _iou_against(box: torch.Tensor, others: torch.Tensor) -> torch.Tensor:
    lt = torch.max(box[:2], others[:, :2])
    rb = torch.min(box[2:], others[:, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[:, 0] * wh[:, 1]
    area0 = (box[2] - box[0]).clamp(min=0) * (box[3] - box[1]).clamp(min=0)
    areas = (others[:, 2] - others[:, 0]).clamp(min=0) * (
        others[:, 3] - others[:, 1]
    ).clamp(min=0)
    return inter / (area0 + areas - inter).clamp(min=1e-12)


def nms(boxes: torch.Tensor, scores: torch.Tensor, iou_threshold: float) -> torch.Tensor:
    boxes = boxes.float()
    order = torch.argsort(scores, descending=True)
    keep = []
    suppressed = torch.zeros(boxes.shape[0], dtype=torch.bool)
    for idx in order.tolist():
        if suppressed[idx]:
            continue
        keep.append(idx)
        rest = order[~suppressed[order]]
        rest = rest[rest != idx]
        if rest.numel() == 0:
            break
        ious = _iou_against(boxes[idx], boxes[rest])
        suppressed[rest[ious > iou_threshold]] = True
    return torch.as_tensor(keep, dtype=torch.int64)


def batched_nms(
    boxes: torch.Tensor,
    scores: torch.Tensor,
    idxs: torch.Tensor,
    iou_threshold: float,
) -> torch.Tensor:
    if boxes.numel() == 0:
        return torch.empty((0,), dtype=torch.int64, device=boxes.device)
    # torchvision's coordinate trick: offset each category's boxes so
    # different categories never overlap, then one plain NMS
    max_coordinate = boxes.max()
    offsets = idxs.to(boxes) * (max_coordinate + torch.tensor(1).to(boxes))
    boxes_for_nms = boxes + offsets[:, None]
    return nms(boxes_for_nms, scores, iou_threshold)
