"""COCO-style detection evaluation (box AP) — host-side NumPy.

Replacement for the pycocotools COCOeval consumed by detectron2's
COCOEvaluator (evaluation/coco_evaluation.py:34-222) and its C++
acceleration (layers/csrc/cocoeval). Implements the standard protocol:

* greedy per-image matching of score-sorted detections to GT at each IoU
  threshold (0.50:0.05:0.95), highest-IoU-first with already-matched GT
  excluded;
* 101-point interpolated precision/recall;
* area ranges (all / small / medium / large) and max-detections caps;
* summary metrics AP, AP50, AP75, APs, APm, APl, AR@{1,10,100}.

Inputs are plain arrays — the jitted detector's padded outputs convert
directly (see `evaluate_detections`).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_NATIVE = None


def _load_native():
    """Load the C++ accelerator (native/libcocoeval.so) if built."""
    global _NATIVE
    if _NATIVE is not None:
        return _NATIVE or None
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native",
        "libcocoeval.so",
    )
    if not os.path.exists(path):
        _NATIVE = False
        return None
    lib = ctypes.CDLL(path)
    lib.spe_match_image.restype = ctypes.c_int
    lib.spe_match_image.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.spe_accumulate.restype = ctypes.c_int
    lib.spe_accumulate.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ]
    _NATIVE = lib
    return lib


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _u8ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}


def box_iou_xyxy(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.prod(np.clip(a[:, 2:] - a[:, :2], 0, None), axis=1)
    area_b = np.prod(np.clip(b[:, 2:] - b[:, :2], 0, None), axis=1)
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def _match_image(
    det_boxes, det_scores, gt_boxes, iou_thr, area_range, max_dets,
    iou_fn=None, area_fn=None, iou=None,
):
    """Returns (det_matched (D,), det_ignored (D,), num_gt_considered).

    iou_fn/area_fn generalize the geometry (rotated boxes pass 5-column
    arrays with polygon IoU); defaults are axis-aligned xyxy.
    ``iou``: precomputed (D_ordered, G) matrix for the score-ordered,
    max_dets-capped detections — it depends only on the geometry, so
    callers hoist it out of their (area x threshold) loops (pycocotools
    computes computeIoU once per image for the same reason)."""
    if iou_fn is None:
        iou_fn = box_iou_xyxy
    if area_fn is None:
        area_fn = lambda b: np.prod(np.clip(b[:, 2:4] - b[:, 0:2], 0, None), axis=1)
    order = np.argsort(-det_scores, kind="stable")[:max_dets]
    det_boxes = det_boxes[order]
    gt_area = area_fn(gt_boxes)
    gt_ignore = (gt_area < area_range[0]) | (gt_area >= area_range[1])
    if iou is None:
        iou = iou_fn(det_boxes, gt_boxes)
    gt_taken = np.zeros(len(gt_boxes), bool)
    matched = np.zeros(len(det_boxes), bool)
    ignored = np.zeros(len(det_boxes), bool)
    # pycocotools COCOeval.evaluateImg order: gts sorted ignore-last;
    # equal IoU re-matches (later gt in sorted order wins), and once the
    # running best is a non-ignored gt the scan STOPS at the first
    # ignored gt — an ignored gt can never steal a real match.
    gt_order = np.argsort(gt_ignore, kind="stable")
    for d in range(len(det_boxes)):
        best, best_iou = -1, min(iou_thr, 1 - 1e-10)
        for g in gt_order:
            if gt_taken[g]:
                continue
            if best >= 0 and not gt_ignore[best] and gt_ignore[g]:
                break
            if iou[d, g] < best_iou:
                continue
            best, best_iou = g, iou[d, g]
        if best >= 0:
            gt_taken[best] = True
            if gt_ignore[best]:
                ignored[d] = True
            else:
                matched[d] = True
        else:
            # unmatched detection outside the area range is ignored
            d_area = float(area_fn(det_boxes[d : d + 1])[0])
            if d_area < area_range[0] or d_area >= area_range[1]:
                ignored[d] = True
    num_gt = int((~gt_ignore).sum())
    return matched, ignored, det_scores[order], num_gt


def _ap_from_matches(all_matched, all_ignored, all_scores, total_gt):
    """Accumulate precision at the 101 recall points -> AP."""
    if total_gt == 0:
        return np.nan, np.nan
    scores = np.concatenate(all_scores) if all_scores else np.zeros(0)
    matched = np.concatenate(all_matched) if all_matched else np.zeros(0, bool)
    ignored = np.concatenate(all_ignored) if all_ignored else np.zeros(0, bool)
    keep = ~ignored
    scores, matched = scores[keep], matched[keep]
    order = np.argsort(-scores, kind="stable")
    matched = matched[order]
    if len(matched) == 0:
        return 0.0, 0.0
    tp = np.cumsum(matched)
    fp = np.cumsum(~matched)
    recall = tp / total_gt
    precision = tp / np.maximum(tp + fp, 1e-12)
    # make precision monotone decreasing
    for i in range(len(precision) - 1, 0, -1):
        precision[i - 1] = max(precision[i - 1], precision[i])
    # 101-point interpolation
    idx = np.searchsorted(recall, REC_THRS, side="left")
    prec_at = np.where(idx < len(precision), precision[np.minimum(idx, len(precision) - 1)], 0.0)
    prec_at = np.where(idx < len(precision), prec_at, 0.0)
    ap = prec_at.mean()
    max_recall = recall[-1] if len(recall) else 0.0
    return ap, max_recall


def _match_image_native(lib, det_boxes, det_scores, gt_boxes, iou_thr, area_range, max_dets):
    order = np.argsort(-det_scores, kind="stable")[:max_dets]
    db = np.ascontiguousarray(det_boxes[order], np.float64)
    gb = np.ascontiguousarray(gt_boxes, np.float64)
    matched = np.zeros(len(db), np.uint8)
    ignored = np.zeros(len(db), np.uint8)
    num_gt = lib.spe_match_image(
        _dptr(db), len(db), _dptr(gb), len(gb),
        float(iou_thr), float(area_range[0]), float(area_range[1]),
        _u8ptr(matched), _u8ptr(ignored),
    )
    return matched.astype(bool), ignored.astype(bool), det_scores[order], int(num_gt)


def _ap_native(lib, all_matched, all_ignored, all_scores, total_gt):
    scores = np.concatenate(all_scores) if all_scores else np.zeros(0)
    matched = np.concatenate(all_matched) if all_matched else np.zeros(0, bool)
    ignored = np.concatenate(all_ignored) if all_ignored else np.zeros(0, bool)
    order = np.argsort(-scores, kind="stable")
    m = np.ascontiguousarray(matched[order].astype(np.uint8))
    ig = np.ascontiguousarray(ignored[order].astype(np.uint8))
    ap = ctypes.c_double()
    mr = ctypes.c_double()
    lib.spe_accumulate(_u8ptr(m), _u8ptr(ig), len(m), int(total_gt),
                       ctypes.byref(ap), ctypes.byref(mr))
    return ap.value, mr.value


def evaluate_detections(
    detections: list[dict],
    ground_truths: list[dict],
    max_dets: int = 100,
    backend: str = "auto",
) -> dict[str, float]:
    """Evaluate one category of detections.

    Args:
      detections: per image {"boxes" (D,4) xyxy, "scores" (D,)}.
      ground_truths: per image {"boxes" (G,4) xyxy}.
      max_dets: cap per image (reference export uses
        COCOEvaluator(max_dets_per_image=1), train_object_detection.py:56).

    Returns summary dict: AP, AP50, AP75, APs/m/l, AR@max_dets.
    """
    assert len(detections) == len(ground_truths)
    lib = _load_native() if backend in ("auto", "native") else None
    if backend == "native" and lib is None:
        raise RuntimeError("native cocoeval not built (make -C native)")
    results = {}
    ap_per_iou = {}
    # per-image prep + IoU, hoisted out of the 4x10 (area x thr) loops
    prepped = []
    for det, gt in zip(detections, ground_truths):
        det_b = np.asarray(det["boxes"], np.float64)
        det_s = np.asarray(det["scores"], np.float64)
        gt_b = np.asarray(gt["boxes"], np.float64).reshape(-1, 4)
        iou_pre = None
        if lib is None:
            order = np.argsort(-det_s, kind="stable")[:max_dets]
            iou_pre = box_iou_xyxy(det_b[order], gt_b)
        prepped.append((det_b, det_s, gt_b, iou_pre))
    for area_name, area_range in AREA_RANGES.items():
        aps, ars = [], []
        for t in IOU_THRS:
            all_matched, all_ignored, all_scores = [], [], []
            total_gt = 0
            for det_b, det_s, gt_b, iou_pre in prepped:
                if lib is not None:
                    m, ig, sc, ng = _match_image_native(
                        lib, det_b, det_s, gt_b, t, area_range, max_dets
                    )
                else:
                    m, ig, sc, ng = _match_image(
                        det_b, det_s, gt_b, t, area_range, max_dets,
                        iou=iou_pre,
                    )
                all_matched.append(m)
                all_ignored.append(ig)
                all_scores.append(sc)
                total_gt += ng
            if lib is not None:
                ap, ar = _ap_native(lib, all_matched, all_ignored, all_scores, total_gt)
            else:
                ap, ar = _ap_from_matches(all_matched, all_ignored, all_scores, total_gt)
            aps.append(ap)
            ars.append(ar)
            if area_name == "all":
                ap_per_iou[round(float(t), 2)] = ap
        key = {"all": "AP", "small": "APs", "medium": "APm", "large": "APl"}[area_name]
        results[key] = float(np.nanmean(aps)) * 100 if not np.all(np.isnan(aps)) else float("nan")
        if area_name == "all":
            results["AR"] = float(np.nanmean(ars)) * 100 if not np.all(np.isnan(ars)) else float("nan")
    results["AP50"] = ap_per_iou.get(0.5, np.nan) * 100
    results["AP75"] = ap_per_iou.get(0.75, np.nan) * 100
    return results


def evaluate_rotated_detections(
    detections: list[dict],
    ground_truths: list[dict],
    max_dets: int = 100,
) -> dict[str, float]:
    """Rotated-box AP (detectron2 evaluation/rotated_coco_evaluation.py
    semantics): boxes are (cx, cy, w, h, angle_deg); matching uses exact
    polygon-clipping IoU (ops/rotated_boxes.pairwise_iou_rotated — the
    XLA replacement for the box_iou_rotated csrc kernel) and areas are
    w*h. Same 101-point protocol/area-ranges as the axis-aligned path.
    """
    import jax

    from ..ops.rotated_boxes import pairwise_iou_rotated

    iou_jit = jax.jit(pairwise_iou_rotated)

    def iou_fn(a, b):
        if len(a) == 0 or len(b) == 0:
            return np.zeros((len(a), len(b)))
        return np.asarray(iou_jit(np.asarray(a, np.float32), np.asarray(b, np.float32)))

    def area_fn(b):
        b = np.asarray(b).reshape(-1, 5)
        return np.abs(b[:, 2] * b[:, 3])

    results = {}
    ap_per_iou = {}
    prepped = []
    for det, gt in zip(detections, ground_truths):
        det_b = np.asarray(det["boxes"], np.float64).reshape(-1, 5)
        det_s = np.asarray(det["scores"], np.float64)
        gt_b = np.asarray(gt["boxes"], np.float64).reshape(-1, 5)
        order = np.argsort(-det_s, kind="stable")[:max_dets]
        prepped.append((det_b, det_s, gt_b, iou_fn(det_b[order], gt_b)))
    for area_name, area_range in AREA_RANGES.items():
        aps, ars = [], []
        for t in IOU_THRS:
            all_matched, all_ignored, all_scores = [], [], []
            total_gt = 0
            for det_b, det_s, gt_b, iou_pre in prepped:
                m, ig, sc, ng = _match_image(
                    det_b, det_s, gt_b,
                    t, area_range, max_dets,
                    iou_fn=iou_fn, area_fn=area_fn, iou=iou_pre,
                )
                all_matched.append(m)
                all_ignored.append(ig)
                all_scores.append(sc)
                total_gt += ng
            ap, ar = _ap_from_matches(all_matched, all_ignored, all_scores, total_gt)
            aps.append(ap)
            ars.append(ar)
            if area_name == "all":
                ap_per_iou[round(float(t), 2)] = ap
        key = {"all": "AP", "small": "APs", "medium": "APm", "large": "APl"}[area_name]
        results[key] = float(np.nanmean(aps)) * 100 if not np.all(np.isnan(aps)) else float("nan")
        if area_name == "all":
            results["AR"] = float(np.nanmean(ars)) * 100 if not np.all(np.isnan(ars)) else float("nan")
    results["AP50"] = ap_per_iou.get(0.5, np.nan) * 100
    results["AP75"] = ap_per_iou.get(0.75, np.nan) * 100
    return results


def padded_detections_to_list(dets: dict) -> list[dict]:
    """Jitted detector padded outputs (B, K, ...) + valid -> per-image lists."""
    out = []
    boxes = np.asarray(dets["boxes"])
    scores = np.asarray(dets["scores"])
    valid = np.asarray(dets["valid"])
    for i in range(boxes.shape[0]):
        v = valid[i]
        out.append({"boxes": boxes[i][v], "scores": scores[i][v]})
    return out


def evaluate_semantic_segmentation(
    predictions: list,
    ground_truths: list,
    num_classes: int,
    ignore_label: int = 255,
) -> dict[str, float]:
    """Semantic-segmentation evaluation (detectron2
    evaluation/sem_seg_evaluation.py semantics): per-pixel confusion
    matrix over label maps -> mIoU, fwIoU, mACC, pACC.

    predictions/ground_truths: per-image (H, W) integer label maps;
    pixels with gt == ignore_label are excluded.
    """
    conf = np.zeros((num_classes, num_classes), np.int64)
    for pred, gt in zip(predictions, ground_truths):
        pred = np.asarray(pred).reshape(-1)
        gt = np.asarray(gt).reshape(-1)
        keep = gt != ignore_label
        pred, gt = pred[keep], gt[keep]
        conf += np.bincount(
            gt.astype(np.int64) * num_classes + pred.astype(np.int64),
            minlength=num_classes * num_classes,
        ).reshape(num_classes, num_classes)

    tp = np.diag(conf).astype(np.float64)
    pos_gt = conf.sum(axis=1).astype(np.float64)
    pos_pred = conf.sum(axis=0).astype(np.float64)
    union = pos_gt + pos_pred - tp
    valid = pos_gt > 0
    iou = np.full(num_classes, np.nan)
    iou[union > 0] = tp[union > 0] / union[union > 0]
    acc = np.full(num_classes, np.nan)
    acc[valid] = tp[valid] / pos_gt[valid]
    freq = pos_gt / max(pos_gt.sum(), 1)

    miou = float(np.nanmean(iou[valid])) if valid.any() else float("nan")
    fwiou = float(np.nansum(iou[valid] * freq[valid])) if valid.any() else float("nan")
    macc = float(np.nanmean(acc[valid])) if valid.any() else float("nan")
    pacc = float(tp.sum() / max(pos_gt.sum(), 1))
    return {
        "mIoU": miou * 100,
        "fwIoU": fwiou * 100,
        "mACC": macc * 100,
        "pACC": pacc * 100,
    }


# ---------------------------------------------------------------------------
# keypoint (OKS) and instance-mask AP — the remaining COCOEvaluator tasks
# (detectron2 evaluation/coco_evaluation.py:69 evaluates
# {"bbox", "segm", "keypoints"}; semantics below follow pycocotools
# COCOeval with iouType 'keypoints'/'segm')
# ---------------------------------------------------------------------------

# pycocotools person-keypoint defaults (COCOeval.__init__); used when the
# caller gives no per-keypoint sigmas and J == 17
COCO_PERSON_SIGMAS = np.array(
    [.26, .25, .25, .35, .35, .79, .79, .72, .72, .62, .62, 1.07, 1.07,
     .87, .87, .89, .89]
) / 10.0

# keypoint protocol uses only all/medium/large and maxDets=20
KPT_AREA_RANGES = {
    "all": (0.0, 1e10),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}


def compute_oks(
    det_kps: np.ndarray,  # (D, J, 3) x, y, score
    gt_kps: np.ndarray,  # (G, J, 3) x, y, vis
    gt_areas: np.ndarray,  # (G,)
    gt_boxes: np.ndarray,  # (G, 4) xywh — the k1==0 fallback region
    sigmas: np.ndarray,
) -> np.ndarray:
    """Object-keypoint-similarity matrix (pycocotools computeOks):
    mean over labeled keypoints of exp(-d^2 / (2 area sigma_i^2)); for
    gts with no labeled keypoints, distances are measured to a 2x-
    expanded gt box (every keypoint counts)."""
    D, G = len(det_kps), len(gt_kps)
    ious = np.zeros((D, G))
    if D == 0 or G == 0:
        return ious
    var = (2.0 * np.asarray(sigmas)) ** 2
    for j in range(G):
        xg, yg, vg = gt_kps[j, :, 0], gt_kps[j, :, 1], gt_kps[j, :, 2]
        k1 = int((vg > 0).sum())
        x0 = gt_boxes[j, 0] - gt_boxes[j, 2]
        x1 = gt_boxes[j, 0] + gt_boxes[j, 2] * 2
        y0 = gt_boxes[j, 1] - gt_boxes[j, 3]
        y1 = gt_boxes[j, 1] + gt_boxes[j, 3] * 2
        for i in range(D):
            xd, yd = det_kps[i, :, 0], det_kps[i, :, 1]
            if k1 > 0:
                dx = xd - xg
                dy = yd - yg
            else:
                dx = np.maximum(0.0, x0 - xd) + np.maximum(0.0, xd - x1)
                dy = np.maximum(0.0, y0 - yd) + np.maximum(0.0, yd - y1)
            e = (dx**2 + dy**2) / var / (gt_areas[j] + np.spacing(1)) / 2.0
            if k1 > 0:
                e = e[vg > 0]
            ious[i, j] = float(np.sum(np.exp(-e)) / e.shape[0])
    return ious


def evaluate_keypoints(
    detections: list[dict],
    ground_truths: list[dict],
    sigmas: np.ndarray | None = None,
    max_dets: int = 20,
) -> dict[str, float]:
    """Keypoint-OKS AP (COCOEvaluator task "keypoints").

    Args:
      detections: per image {"keypoints" (D, J, 3), "scores" (D,)}.
      ground_truths: per image {"keypoints" (G, J, 3) with vis in col 2,
        "boxes" (G, 4) xywh; optional "areas" (G,) — defaults to w*h}.
      sigmas: per-keypoint OKS sigmas; defaults to the COCO-person 17
        when J == 17, else uniform 0.05 (d2 TEST.KEYPOINT_OKS_SIGMAS).

    GTs with zero labeled keypoints are ignored (pycocotools
    'num_keypoints == 0' rule), as are those outside the area range.
    """
    assert len(detections) == len(ground_truths)
    results = {}
    ap_per_iou = {}

    def area_fn(rows):
        return rows[:, 0]

    # per-image packing + OKS matrix, hoisted out of the 3x10 loops
    prepped = []
    for det, gt in zip(detections, ground_truths):
        det_kps = np.asarray(det["keypoints"], np.float64)
        det_kps = det_kps.reshape((-1,) + tuple(det_kps.shape[1:])) if det_kps.size else np.zeros((0, 1, 3))
        det_s = np.asarray(det["scores"], np.float64)
        gt_kps = np.asarray(gt["keypoints"], np.float64)
        gt_kps = gt_kps.reshape((-1,) + tuple(gt_kps.shape[1:])) if gt_kps.size else np.zeros((0, det_kps.shape[1] if len(det_kps) else 1, 3))
        gt_boxes = np.asarray(gt["boxes"], np.float64).reshape(-1, 4)
        jj = det_kps.shape[1] if len(det_kps) else gt_kps.shape[1]
        if sigmas is None:
            sg = COCO_PERSON_SIGMAS if jj == 17 else np.full(jj, 0.05)
        else:
            sg = np.asarray(sigmas, np.float64)
        gt_areas = np.asarray(
            gt.get("areas", gt_boxes[:, 2] * gt_boxes[:, 3]), np.float64
        )

        # pack [area, ...] rows; empty-kp gts get area -1 ->
        # always outside the range -> ignored (the pycocotools
        # num_keypoints==0 rule). Detection "area" for the
        # unmatched-det ignore rule is the predicted-keypoint
        # bbox area (pycocotools uses the det's own area field).
        n_vis = (gt_kps[:, :, 2] > 0).sum(axis=1) if len(gt_kps) else np.zeros(0)
        gt_eff_area = np.where(n_vis > 0, gt_areas, -1.0)
        if len(det_kps):
            dw = det_kps[:, :, 0].max(1) - det_kps[:, :, 0].min(1)
            dh = det_kps[:, :, 1].max(1) - det_kps[:, :, 1].min(1)
            dpack = np.concatenate(
                [(dw * dh)[:, None], det_kps.reshape(len(det_kps), -1)],
                axis=1,
            )
        else:
            dpack = np.zeros((0, 1 + jj * 3))
        gpack = np.concatenate(
            [gt_eff_area[:, None], gt_areas[:, None], gt_boxes,
             gt_kps.reshape(len(gt_kps), -1)], axis=1
        ) if len(gt_kps) else np.zeros((0, 2 + 4 + jj * 3))

        order = np.argsort(-det_s, kind="stable")[:max_dets]
        dp = dpack[order]
        if len(dp) == 0 or len(gpack) == 0:
            iou_pre = np.zeros((len(dp), len(gpack)))
        else:
            iou_pre = compute_oks(
                dp[:, 1:].reshape(len(dp), jj, 3),
                gpack[:, 6:].reshape(len(gpack), jj, 3),
                gpack[:, 1],  # TRUE area for OKS even on ignored gts
                gpack[:, 2:6],
                sg,
            )
        prepped.append((dpack, det_s, gpack, iou_pre))

    for area_name, area_range in KPT_AREA_RANGES.items():
        aps, ars = [], []
        for t in IOU_THRS:
            all_matched, all_ignored, all_scores = [], [], []
            total_gt = 0
            for dpack, det_s, gpack, iou_pre in prepped:
                m, ig, sc, ng = _match_image(
                    dpack, det_s, gpack, t, area_range, max_dets,
                    area_fn=area_fn, iou=iou_pre,
                )
                all_matched.append(m)
                all_ignored.append(ig)
                all_scores.append(sc)
                total_gt += ng
            ap, ar = _ap_from_matches(all_matched, all_ignored, all_scores, total_gt)
            aps.append(ap)
            ars.append(ar)
            if area_name == "all":
                ap_per_iou[round(float(t), 2)] = ap
        key = {"all": "AP", "medium": "APm", "large": "APl"}[area_name]
        results[key] = float(np.nanmean(aps)) * 100 if not np.all(np.isnan(aps)) else float("nan")
        if area_name == "all":
            results["AR"] = float(np.nanmean(ars)) * 100 if not np.all(np.isnan(ars)) else float("nan")
    results["AP50"] = ap_per_iou.get(0.5, np.nan) * 100
    results["AP75"] = ap_per_iou.get(0.75, np.nan) * 100
    return results


def mask_iou(det_masks: np.ndarray, gt_masks: np.ndarray) -> np.ndarray:
    """(D, H, W) x (G, H, W) binary-mask IoU."""
    if len(det_masks) == 0 or len(gt_masks) == 0:
        return np.zeros((len(det_masks), len(gt_masks)))
    d = np.asarray(det_masks, bool).reshape(len(det_masks), -1)
    g = np.asarray(gt_masks, bool).reshape(len(gt_masks), -1)
    inter = (d[:, None, :] & g[None, :, :]).sum(-1).astype(np.float64)
    union = (d[:, None, :] | g[None, :, :]).sum(-1).astype(np.float64)
    return np.where(union > 0, inter / np.maximum(union, 1), 0.0)


def evaluate_instance_segmentation(
    detections: list[dict],
    ground_truths: list[dict],
    max_dets: int = 100,
) -> dict[str, float]:
    """Instance-mask AP (COCOEvaluator task "segm"): identical matching
    protocol to box AP but with binary-mask IoU and mask-pixel areas.

    detections: per image {"masks" (D, H, W) bool, "scores" (D,)}.
    ground_truths: per image {"masks" (G, H, W) bool}.
    """
    assert len(detections) == len(ground_truths)
    results = {}
    ap_per_iou = {}
    # per-image packing + mask-IoU matrix (the expensive part), hoisted
    # out of the 4x10 loops
    prepped = []
    for det, gt in zip(detections, ground_truths):
        dm = np.asarray(det["masks"], bool)
        gm = np.asarray(gt["masks"], bool)
        dm = dm.reshape((-1,) + dm.shape[-2:]) if dm.size else dm.reshape(0, 1, 1)
        gm = gm.reshape((-1,) + gm.shape[-2:]) if gm.size else gm.reshape(0, 1, 1)
        det_s = np.asarray(det["scores"], np.float64)
        # pack [area, flat mask bits] — the same row-packing trick
        # as keypoints so _match_image's area logic applies
        npx = int(np.prod(dm.shape[1:])) if dm.ndim == 3 else 1
        dareas = dm.reshape(len(dm), npx).sum(-1).astype(np.float64)
        npx_g = int(np.prod(gm.shape[1:])) if gm.ndim == 3 else 1
        gareas = gm.reshape(len(gm), npx_g).sum(-1).astype(np.float64)
        dpack = np.concatenate(
            [dareas[:, None], dm.reshape(len(dm), -1)], axis=1
        ) if len(dm) else np.zeros((0, 2))
        gpack = np.concatenate(
            [gareas[:, None], gm.reshape(len(gm), -1)], axis=1
        ) if len(gm) else np.zeros((0, 2))
        order = np.argsort(-det_s, kind="stable")[:max_dets]
        iou_pre = mask_iou(dm[order], gm)
        prepped.append((dpack, det_s, gpack, iou_pre))

    for area_name, area_range in AREA_RANGES.items():
        aps, ars = [], []
        for t in IOU_THRS:
            all_matched, all_ignored, all_scores = [], [], []
            total_gt = 0
            for dpack, det_s, gpack, iou_pre in prepped:
                m, ig, sc, ng = _match_image(
                    dpack, det_s, gpack, t, area_range, max_dets,
                    area_fn=lambda rows: rows[:, 0], iou=iou_pre,
                )
                all_matched.append(m)
                all_ignored.append(ig)
                all_scores.append(sc)
                total_gt += ng
            ap, ar = _ap_from_matches(all_matched, all_ignored, all_scores, total_gt)
            aps.append(ap)
            ars.append(ar)
            if area_name == "all":
                ap_per_iou[round(float(t), 2)] = ap
        key = {"all": "AP", "small": "APs", "medium": "APm", "large": "APl"}[area_name]
        results[key] = float(np.nanmean(aps)) * 100 if not np.all(np.isnan(aps)) else float("nan")
        if area_name == "all":
            results["AR"] = float(np.nanmean(ars)) * 100 if not np.all(np.isnan(ars)) else float("nan")
    results["AP50"] = ap_per_iou.get(0.5, np.nan) * 100
    results["AP75"] = ap_per_iou.get(0.75, np.nan) * 100
    return results
