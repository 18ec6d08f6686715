"""End-to-end throughput benchmark: crop -> HRNet-W32 -> decode -> PnP.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
vs_baseline is measured against the north-star target of 2000
frames/s/chip (BASELINE.md) — >1.0 beats it.

The primary metric is the int8 serving configuration (PTQ HRNet,
models/hrnet_int8.py; fidelity-tested in tests/test_hrnet_int8.py); the
"extra" field reports the bf16 training-parity configuration when
BENCH_FULL=1.

Timing methodology: this image's axon TPU backend is fully asynchronous
(`block_until_ready` returns before execution) and has a ~25 ms host
round-trip. We therefore run the pipeline N times inside a single
carry-chained `lax.scan` dispatch (the carry feeds each iteration so XLA
cannot hoist or dedupe the body) and report the *marginal* cost between
two N values — pure device throughput, dispatch overhead excluded.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# persistent XLA compilation cache: the fused graphs take 10-40 min to
# compile through the remote compile service; cached re-runs are seconds
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

BASELINE_FPS = 2000.0


def build(batch, mode="int8"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spacecraft_pose_estimation_tpu.models.hrnet import HRNet, POSE_HRNET_W32
    from spacecraft_pose_estimation_tpu.pipeline import (
        PipelineConfig,
        make_pose_pipeline,
        normalize_crops,
    )

    num_joints = 11
    h, w = 1200, 1920  # SPEED+ frame size

    model = HRNet(config=POSE_HRNET_W32.with_joints(num_joints), dtype=jnp.bfloat16)
    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, 512, 512, 3)), train=False)
    )(jax.random.key(0))

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, size=(batch, h, w, 3)).astype(np.float32))
    boxes = jnp.asarray(
        np.tile(np.array([[700.0, 400.0, 500.0, 420.0]], np.float32), (batch, 1))
    )
    lm3d = rng.normal(size=(num_joints, 3)).astype(np.float32)
    K = np.array([[2988.6, 0, 960.0], [0, 2988.3, 600.0], [0, 0, 1]], np.float32)
    dist = np.zeros(5, np.float32)

    if mode == "int8":
        from spacecraft_pose_estimation_tpu.models.hrnet_int8 import (
            HRNetInt8,
            quantize_hrnet,
        )

        calib = normalize_crops(
            jnp.asarray(rng.integers(0, 255, size=(4, 512, 512, 3)), jnp.float32)
        )
        q = quantize_hrnet(model, variables, calib)
        # Pallas fused block chains: validate the lowering on a small
        # smoke first; fall back to the per-op walk on any failure so
        # the primary metric never dies on a kernel regression.
        use_fused = os.environ.get("BENCH_FUSED", "0") == "1"
        if use_fused:
            try:
                m_try = HRNetInt8(model.config, fused_blocks=True)
                _ = float(jnp.sum(m_try.apply(q, calib[:2])))
                _progress("fused block kernels: OK")
            except Exception as e:
                _progress(f"fused block kernels unavailable ({type(e).__name__}); per-op walk")
                use_fused = False
        serving_model = HRNetInt8(model.config, fused_blocks=use_fused)
        serving_vars = q
    else:
        serving_model, serving_vars = model, variables

    run = make_pose_pipeline(
        serving_model, lm3d, K, dist, PipelineConfig(solver="gn", refine_iters=5)
    )

    from functools import partial

    @partial(jax.jit, static_argnames=("n",))
    def repeat(variables, frames, boxes, n):
        def body(carry, _):
            # carry-dependent perturbation forces truly serial execution.
            # Perturb the tiny boxes array, NOT the frames: materialising a
            # perturbed 3.5 GB frame tensor per iteration would add ~7 GB
            # of artificial HBM traffic per step.
            bx = boxes + carry * 1e-20
            out = run(variables, frames, bx)
            c = carry + jnp.sum(out["t"]) * 1e-20
            return c, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return c

    def timed(n):
        t0 = time.perf_counter()
        _ = float(repeat(serving_vars, frames, boxes, n))  # readback forces exec
        return time.perf_counter() - t0

    return timed


def _progress(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def measure(batch, mode, n_lo, n_hi, reps=3):
    _progress(f"building {mode} pipeline (batch {batch})")
    timed = build(batch, mode)
    _progress("compiling + first run")
    timed(n_lo)  # compile both variants
    timed(n_hi)
    t_lo = min(timed(n_lo) for _ in range(reps))
    t_hi = min(timed(n_hi) for _ in range(reps))
    dt = (t_hi - t_lo) / (n_hi - n_lo)
    return batch / dt


def build_full_path(det_batch=8, det_every=16):
    """TRUE fused serving path: detect -> best box -> crop -> HRNet ->
    decode -> PnP, one jitted graph over a clip of det_batch*det_every
    frames from one stream.

    Serving mode: the detector (X101-FPN 768^2 bf16) runs on every
    det_every-th frame; its argmax box (1.5x-padded by the crop stage,
    models/rcnn.select_best_box semantics) is held for the following
    det_every-1 frames — spacecraft inter-frame motion is far inside the
    crop margin. det_every=1 gives the detect-EVERY-frame variant.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spacecraft_pose_estimation_tpu.models.hrnet import HRNet, POSE_HRNET_W32
    from spacecraft_pose_estimation_tpu.models.hrnet_int8 import (
        HRNetInt8,
        quantize_hrnet,
    )
    from spacecraft_pose_estimation_tpu.models.rcnn import (
        FASTER_RCNN_X101_SERVING,
        GeneralizedRCNN,
        select_best_box,
    )
    from spacecraft_pose_estimation_tpu.pipeline import (
        PipelineConfig,
        make_pose_pipeline,
        normalize_crops,
    )

    num_joints = 11
    h, w = 1200, 1920
    det_size = 768
    clip = det_batch * det_every

    det_model = GeneralizedRCNN(config=FASTER_RCNN_X101_SERVING, dtype=jnp.bfloat16)
    det_vars = jax.jit(lambda k: det_model.init(
        {"params": k}, jnp.zeros((1, det_size, det_size, 3)), train=False
    ))(jax.random.key(0))

    lm_model = HRNet(config=POSE_HRNET_W32.with_joints(num_joints), dtype=jnp.bfloat16)
    lm_vars = jax.jit(
        lambda k: lm_model.init(k, jnp.zeros((1, 512, 512, 3)), train=False)
    )(jax.random.key(1))
    rng = np.random.default_rng(0)
    calib = normalize_crops(
        jnp.asarray(rng.integers(0, 255, size=(4, 512, 512, 3)), jnp.float32)
    )
    q_vars = quantize_hrnet(lm_model, lm_vars, calib)
    serving_lm = HRNetInt8(lm_model.config)

    lm3d = rng.normal(size=(num_joints, 3)).astype(np.float32)
    K = np.array([[2988.6, 0, 960.0], [0, 2988.3, 600.0], [0, 0, 1]], np.float32)
    dist = np.zeros(5, np.float32)
    pose_run = make_pose_pipeline(
        serving_lm, lm3d, K, dist, PipelineConfig(solver="gn", refine_iters=5)
    )

    frames = jnp.asarray(
        rng.integers(0, 255, size=(clip, h, w, 3)).astype(np.float32)
    )
    # letterbox geometry (static): scale to fit det_size, pad bottom
    scale = det_size / max(h, w)
    lb_h, lb_w = int(round(h * scale)), int(round(w * scale))

    from functools import partial

    @partial(jax.jit, static_argnames=("n",))
    def repeat(det_vars, q_vars, frames, n):
        def body(carry, _):
            f = frames + carry * 1e-20
            # device-side letterbox of the detector keyframes
            keyframes = f[::det_every]
            lb = jax.image.resize(
                keyframes, (det_batch, lb_h, lb_w, 3), method="bilinear"
            )
            lb = jnp.pad(lb, ((0, 0), (0, det_size - lb_h), (0, det_size - lb_w), (0, 0)))
            dets = det_model.apply(det_vars, lb, train=False)
            best = select_best_box(dets, (det_size, det_size)) / scale
            boxes_xywh = jnp.stack(
                [best[:, 0], best[:, 1], best[:, 2] - best[:, 0], best[:, 3] - best[:, 1]],
                axis=1,
            )
            # hold each keyframe box for its det_every-frame window
            boxes_all = jnp.repeat(boxes_xywh, det_every, axis=0)
            out = pose_run(q_vars, f, boxes_all)
            c = carry + jnp.sum(out["t"]) * 1e-20
            return c, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return c

    def timed(n):
        t0 = time.perf_counter()
        _ = float(repeat(det_vars, q_vars, frames, n))
        return time.perf_counter() - t0

    return timed, clip


def measure_full_path(det_batch, det_every, n_lo=1, n_hi=4, reps=3):
    timed, clip = build_full_path(det_batch, det_every)
    timed(n_lo)
    timed(n_hi)
    t_lo = min(timed(n_lo) for _ in range(reps))
    t_hi = min(timed(n_hi) for _ in range(reps))
    dt = (t_hi - t_lo) / (n_hi - n_lo)
    return clip / dt


def main():
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    n_lo = int(os.environ.get("BENCH_N_LO", "2"))
    n_hi = int(os.environ.get("BENCH_N_HI", "12"))

    fps = measure(batch, "int8", n_lo, n_hi)
    _progress(f"primary int8 fps: {fps:.1f}")
    extra = {"mode": "int8_serving", "batch": batch}

    def emit():
        print(
            json.dumps(
                {
                    "metric": "e2e_crop_hrnetw32_decode_pnp_frames_per_sec",
                    "value": round(fps, 2),
                    "unit": "frames/s/chip",
                    "vs_baseline": round(fps / BASELINE_FPS, 4),
                    "extra": extra,
                }
            ),
            flush=True,
        )

    # emit the primary result IMMEDIATELY: the full-path extras compile
    # two more large graphs (~15-20 min each through the remote compile
    # service, no local cache) and a driver timeout must not lose the
    # primary number. A second, enriched JSON line replaces this one if
    # the extras complete (drivers reading either the first or the last
    # JSON line get a valid result).
    emit()

    if os.environ.get("BENCH_FULL"):
        extra["bf16_fps"] = round(measure(batch, "bf16", n_lo, n_hi), 2)

    # TRUE full path (VERDICT r1 #3): detect -> best box -> crop ->
    # HRNet -> PnP in one graph. Two serving points: detector on every
    # frame, and the tracked mode (detect every 16th frame, hold box).
    if not os.environ.get("BENCH_SKIP_FULL_PATH"):
        try:
            _progress("full path: detect every frame")
            extra["full_path_det_every_frame_fps"] = round(
                measure_full_path(det_batch=8, det_every=1), 2
            )
            _progress("full path: detect every 16th frame")
            extra["full_path_det_every_16_fps"] = round(
                measure_full_path(det_batch=8, det_every=16), 2
            )
        except Exception as e:  # keep the primary metric robust
            extra["full_path_error"] = f"{type(e).__name__}: {e}"[:200]
        emit()


if __name__ == "__main__":
    main()
