"""Landmark-stage train/validate orchestration.

Compiled equivalents of lib/core/function.py:
* `train_epoch` — the `train` loop (:27-94): device transform + train
  step + PCK accuracy, metrics into storage.
* `validate` — (:318-459): batched eval with optional flip-test (+1px
  SHIFT_HEATMAP) and heatmap averaging, sub-pixel decode back to source
  coordinates, accumulate all_preds, write `pred.mat`
  (EventsDataset.evaluate contract, events.py:116-125).
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Iterable

import numpy as np

import jax
import jax.numpy as jnp

from ..data import coco_io
from ..data.landmark_dataset import LandmarkExamples, batch_iterator, device_transform
from ..ops import heatmap as hm_ops
from .accuracy import pck_accuracy
from .loss import joints_mse_loss
from .metrics import MetricStorage

logger = logging.getLogger(__name__)


def make_validate_step(model, post_process: bool = True, flip_test: bool = False,
                       shift_heatmap: bool = True):
    """Jitted: images+crop geometry -> decoded source-coord keypoints."""

    def step(variables, images, centers, scales):
        hm = model.apply(variables, images, train=False)
        if flip_test:
            hm_f = model.apply(variables, images[:, :, ::-1, :], train=False)
            hm_f = hm_f[:, :, ::-1, :]  # un-flip width (no left/right pairs
            # to swap: spacecraft landmarks have no symmetry groups)
            if shift_heatmap:
                # function.py:357-361: shift flipped heatmap right by 1px
                hm_f = jnp.concatenate([hm_f[:, :, :1, :], hm_f[:, :, :-1, :]], axis=2)
            hm = (hm + hm_f) * 0.5
        preds, maxvals = hm_ops.decode_heatmaps(hm, centers, scales, post_process)
        return preds, maxvals, hm

    return jax.jit(step)


def validate(
    model,
    variables,
    examples: LandmarkExamples,
    batch_size: int,
    image_size: tuple[int, int],
    output_path: str | None = None,
    flip_test: bool = False,
    post_process: bool = True,
    shift_heatmap: bool = True,
) -> np.ndarray:
    """Run the full validation pass; returns all_preds (N, J, 3) and
    optionally writes pred.mat. Order matches the dataset order (the
    contract consumed by the PnP stage)."""
    from ..ops.geometry import bbox_to_center_scale

    step = make_validate_step(model, post_process, flip_test, shift_heatmap)
    n = len(examples)
    num_joints = examples.num_joints
    all_preds = np.zeros((n, num_joints, 3), np.float32)

    # fixed-size batches with tail padding
    for start in range(0, n, batch_size):
        idx = list(range(start, min(start + batch_size, n)))
        pad = batch_size - len(idx)
        exs = [examples.example(i) for i in idx]
        images = np.stack([e["image"] for e in exs] + [exs[-1]["image"]] * pad)
        bboxes = np.stack([e["bbox"] for e in exs] + [exs[-1]["bbox"]] * pad)
        centers, scales = jax.vmap(bbox_to_center_scale)(jnp.asarray(bboxes))
        from ..ops.warp import batched_crop_and_resize
        from ..pipeline import normalize_crops

        crops = batched_crop_and_resize(
            jnp.asarray(images), centers, scales, jnp.zeros(batch_size), image_size
        )
        preds, maxvals, _ = step(variables, normalize_crops(crops), centers, scales)
        preds = np.asarray(preds)[: len(idx)]
        maxvals = np.asarray(maxvals)[: len(idx)]
        all_preds[start : start + len(idx), :, :2] = preds
        all_preds[start : start + len(idx), :, 2] = maxvals

    if output_path:
        coco_io.save_pred_mat(all_preds, output_path)
        logger.info("wrote %s", output_path)
    return all_preds


def train_epoch(
    train_step,
    state,
    data_iter,
    steps: int,
    storage: MetricStorage,
    transform_kwargs: dict,
    base_key,
    print_freq: int = 20,
    cache=None,
):
    """One epoch: host batch -> device transform -> jitted step.

    Steps dispatch asynchronously and metrics stay ON DEVICE until one
    epoch-end readback: per-step ``float(metric)`` / ``int(state.step)``
    conversions each block on a full TPU-tunnel round trip, which
    measured ~4 s/step of pure latency on the axon backend (the r5
    accuracy run: 45 s/epoch for ~0.7 s of actual compute). The fold_in
    step index is derived host-side (state.step increments by exactly 1
    per step), so the augmentation key stream is bit-identical to the
    per-step-readback version."""
    step0 = int(state.step)
    collected = []
    for i in range(steps):
        raw = next(data_iter)
        key = jax.random.fold_in(base_key, step0 + i)
        if cache is not None:
            # device-resident dataset: `raw` is an index batch; the
            # frames never leave the device (see DeviceDatasetCache)
            images, bboxes, joints, vis = cache.gather(raw)
        else:
            images = jnp.asarray(raw["image"])
            bboxes = jnp.asarray(raw["bbox"])
            joints = jnp.asarray(raw["joints"])
            vis = jnp.asarray(raw["joints_vis"])
        batch = device_transform(
            images,
            bboxes,
            joints,
            vis,
            key,
            **transform_kwargs,
        )
        state, metrics = train_step(state, batch)
        collected.append(metrics)
    for j, m in enumerate(jax.device_get(collected)):
        storage.step = step0 + j + 1
        storage.put_scalars(**{k: float(v) for k, v in m.items()})
        if (j + 1) % print_freq == 0:
            logger.info(
                "step %d loss %.5f acc %.3f",
                step0 + j + 1, storage.avg("loss"), storage.avg("acc"),
            )
    return state


def oks_metrics(all_preds: np.ndarray, examples, sigmas=None) -> dict:
    """Keypoint-OKS AP of a validation pass against the dataset's GT
    (the COCOEvaluator "keypoints" task, wired per VERDICT r2 #5; the
    reference's EventsDataset.evaluate returns a Null metric and relies
    on the downstream PnP stage instead — this gives the landmark stage
    a real standalone metric)."""
    from ..data import coco_eval

    dets, gts = [], []
    for i in range(len(examples)):
        e = examples.example(i)
        joints = np.asarray(e["joints"], np.float64)
        vis = np.asarray(e["joints_vis"], np.float64)
        if vis.ndim == 1:  # LandmarkExamples stores per-joint vis as (J,)
            vis = vis[:, None]
        # joints_vis is the TRAINING weight (COCO vis - 1): v=2 -> 1,
        # v=1 -> 0, v=0 -> -1. pycocotools computeOks counts every
        # LABELED keypoint (vg > 0), i.e. COCO v >= 1 — so map back
        # (+1) instead of passing the weight, or out-of-frame-but-
        # labeled (v=1) joints would be wrongly excluded from OKS.
        gt_kps = np.concatenate([joints[:, :2], vis[:, :1] + 1.0], axis=1)[None]
        bbox = np.asarray(e["bbox"], np.float64)[None]  # xywh
        dets.append({
            "keypoints": np.asarray(all_preds[i], np.float64)[None],
            "scores": np.asarray([float(all_preds[i, :, 2].mean())]),
        })
        gts.append({"keypoints": gt_kps, "boxes": bbox})
    return coco_eval.evaluate_keypoints(dets, gts, sigmas=sigmas)
