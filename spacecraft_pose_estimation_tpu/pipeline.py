"""The fused detect -> crop -> regress -> solve pipeline.

The reference runs three separate processes glued by files
(evaluate_pipeline.py:48-91: detector subprocess -> COCO json -> HRNet
subprocess -> pred.mat -> PnP subprocess -> opencv_poses.json). Here the
whole per-frame path is ONE jitted function over batched frames:

    frames (B,H,W,3 uint8), boxes (B,4 xywh)
      -> center/scale        (events.py:94-113 semantics)
      -> bilinear crop       (JointsDataset.py:190-195)
      -> ImageNet normalize  (tools/test.py:106-108)
      -> heatmap model       (pose_hrnet et al.)
      -> sub-pixel decode    (core/inference.py:49-79)
      -> PnP solve           (export_predicted_poses_real.py:187-204)

File formats (COCO json / pred.mat / opencv_poses.json) survive only at
the import/export edges (see data/coco_io.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

from .ops import geometry, heatmap, pnp, warp

Array = jax.Array

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    image_size: tuple[int, int] = (512, 512)  # (width, height) model input
    bbox_padding: float = 1.5
    post_process: bool = True
    solver: str = "gn"  # 'gn' (trusted confidences) | 'ransac' | 'none'
    warp_dtype: str = "bfloat16"  # interpolation-matmul dtype ('float32' = exact)
    ransac_hypotheses: int = 256
    reproj_threshold: float = 15.0
    refine_iters: int = 10
    min_keypoints: int = 15
    # Serving fast path: crop through a per-frame DMA window of this
    # (h, w) size instead of contracting the full frame (~4x cheaper at
    # 1920x1200, ops/pallas_crop.py). Boxes whose padded crop exceeds
    # the window coverage are tightened (clamp_scales_to_window).
    # None = full-frame path (exact for any box).
    crop_window: tuple[int, int] | None = None
    # 'xla': dynamic_slice the window then separable-MXU warp it
    # (ops/warp.crop_and_resize_mxu_windowed); 'pallas': the in-kernel
    # DMA pooler window (ops/pallas_crop.py). Same clamp contract.
    crop_window_impl: str = "xla"


def normalize_crops(crops: Array) -> Array:
    """uint8/float [0,255] crops -> ImageNet-normalized float32."""
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
    std = jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0
    return (crops.astype(jnp.float32) - mean) / std


def boxes_to_center_scale(boxes: Array, padding: float = 1.5):
    """(B,4) xywh -> (B,2) centers, (B,2) scales."""
    return jax.vmap(partial(geometry.bbox_to_center_scale, padding=padding))(boxes)


def make_landmark_stage(model, config: PipelineConfig = PipelineConfig()):
    """Returns fn(variables, frames, boxes) -> dict(keypoints, confidence, ...).

    Keypoints come back in source-frame pixel coordinates, exactly what the
    reference writes to pred.mat (function.py:318-459 validate path).
    """

    def run(variables, frames: Array, boxes: Array):
        centers, scales = boxes_to_center_scale(boxes, config.bbox_padding)
        rots = jnp.zeros(frames.shape[0], jnp.float32)
        wdtype = {"bfloat16": jnp.bfloat16, "int8": jnp.int8}.get(config.warp_dtype)
        if config.crop_window is not None:
            from .ops import pallas_crop

            cov = (
                (config.crop_window[0] - 2, config.crop_window[1] - 2)
                if config.crop_window_impl == "xla" else None
            )
            scales = pallas_crop.clamp_scales_to_window(
                scales, config.image_size, config.crop_window, coverage=cov
            )
            # both windowed paths contract in bf16 at most; int8 taps
            # apply to the full-frame path only
            wd = jnp.bfloat16 if wdtype == jnp.int8 else (wdtype or jnp.float32)
            if config.crop_window_impl == "xla":
                win = max(int(config.crop_window[0]), int(config.crop_window[1]))
                crops = jax.vmap(
                    lambda im, c, s: warp.crop_and_resize_mxu_windowed(
                        im, c, s, config.image_size, win, compute_dtype=wd
                    )
                )(frames, centers, scales)
            else:
                crops = pallas_crop.crop_and_resize_window(
                    frames, centers, scales, config.image_size, config.crop_window,
                    compute_dtype=wd,
                )
        else:
            # Inference never rotates -> separable MXU crop (TPU gathers
            # are ~100x slower; see ops/warp.crop_and_resize_mxu).
            crops = warp.batched_crop_and_resize(
                frames, centers, scales, rots, config.image_size, method="mxu",
                compute_dtype=wdtype,
            )
        if getattr(model, "consumes_raw_pixels", False):
            # normalize is folded into the model's stem weights
            # (hrnet_int8.fold_normalize) — feed raw [0,255] crops.
            inputs = crops
        else:
            inputs = normalize_crops(crops)
        heatmaps = model.apply(variables, inputs, train=False)
        preds, maxvals = heatmap.decode_heatmaps(
            heatmaps, centers, scales, post_process=config.post_process
        )
        return {
            "keypoints": preds,  # (B, J, 2) source-frame pixels
            "confidence": maxvals,  # (B, J)
            "centers": centers,
            "scales": scales,
            "heatmaps": heatmaps,
        }

    return run


def make_pose_pipeline(
    model,
    landmarks_3d: Array,
    K: Array,
    dist: Array,
    config: PipelineConfig = PipelineConfig(),
) -> Callable:
    """Returns fn(variables, frames, boxes, key) -> full pose results.

    The output dict carries everything the reference's three stages emit:
    per-frame keypoints+confidences (pred.mat), rotation matrices,
    quaternions and translations (opencv_poses.json).
    """
    landmark_stage = make_landmark_stage(model, config)
    lm3d = jnp.asarray(landmarks_3d, jnp.float32)
    K = jnp.asarray(K, jnp.float32)
    dist = jnp.asarray(dist, jnp.float32)

    def solve_frame_gn(kps, conf):
        w = pnp.adaptive_confidence_mask(conf, min_count=config.min_keypoints)
        R, t = pnp.solve_pnp(
            lm3d, kps, K, dist, w.astype(jnp.float32), refine_iters=config.refine_iters
        )
        return R, t

    def solve_frame_ransac(kps, conf, key):
        out = pnp.pnp_ransac(
            lm3d,
            kps,
            K,
            dist,
            conf,
            key,
            num_hypotheses=config.ransac_hypotheses,
            reproj_threshold=config.reproj_threshold,
            refine_iters=config.refine_iters,
            min_count=config.min_keypoints,
        )
        return out["R"], out["t"]

    def run(variables, frames: Array, boxes: Array, key: Array | None = None):
        out = landmark_stage(variables, frames, boxes)
        if config.solver == "none":
            return out
        if config.solver == "ransac":
            keys = jax.random.split(
                key if key is not None else jax.random.key(0), frames.shape[0]
            )
            R, t = jax.vmap(solve_frame_ransac)(out["keypoints"], out["confidence"], keys)
        else:
            R, t = jax.vmap(solve_frame_gn)(out["keypoints"], out["confidence"])
        quat = jax.vmap(geometry.rotmat_to_quat)(R)
        out.update({"R": R, "t": t, "quat": quat})
        return out

    return run
