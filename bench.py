"""End-to-end throughput benchmark: crop -> HRNet-W32 -> decode -> PnP.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
vs_baseline is measured against the north-star target of 2000
frames/s/chip (BASELINE.md) — >1.0 beats it.

Round-3 serving configuration (the primary metric):
  * uint8 frames (the true serving ingest contract — full-frame f32
    tensors tripled HBM read traffic for nothing),
  * full-frame separable bf16 MXU crop (probe-measured fastest vs the
    Pallas windowed DMA crop and the int8-tap variant),
  * int8 PTQ HRNet, per-op direct walk (the s2d packed walks and the
    fused Pallas chains each measured slower in situ — see DEVNOTES),
  * fixed-depth shallow-linalg PnP (ops/pnp.py: 4.05 -> 0.38 ms/b128).

Timing methodology: this image's axon TPU backend is fully asynchronous
(`block_until_ready` returns before execution) and has a ~25 ms host
round-trip. We therefore run the pipeline N times inside a single
carry-chained `lax.scan` dispatch (the carry feeds each iteration so XLA
cannot hoist or dedupe the body) and report the *marginal* cost between
two N values — pure device throughput, dispatch overhead excluded.
The carry perturbs SMALL tensors only (boxes / letterboxed keyframes):
perturbing the frame clip would add GBs of artificial HBM traffic per
iteration (the round-2 full-path numbers suffered exactly that).

Wall-clock budget: every metric is emitted the moment it exists (the
driver reads the last JSON line); the full-path extras are skipped when
the elapsed time exceeds BENCH_BUDGET_S (default 1500 s) so the primary
number always lands inside the driver window.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# persistent XLA compilation cache (no-op under the axon remote compile
# service, which bypasses it — harmless elsewhere)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

BASELINE_FPS = 2000.0
T0 = time.time()
# Budget: a phase only STARTS if elapsed < BUDGET_S. Measured r3s5
# timeline (fresh process, remote compiles): primary lands t+867s,
# det-every-16 phase ends t+1625s, det-every-frame phase ~565s more
# (total ~2200s). 2400 lets all three numbers land while keeping the
# worst case (~50 min) inside the driver's observed ~1 h window.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "2400"))

# Windowed DMA crop measured SLOWER than the full-frame contraction on
# v5e (DMA row-overhead + VMEM ceilings), and int8 taps measured slower
# than bf16 (9.6 vs 7.9 ms/b128 — the int32 intermediate doubles HBM
# traffic; probe_r3d). Serving crop = full-frame separable bf16 warp.
CROP_WINDOW = None
WARP_DTYPE = "bfloat16"


def _progress(msg):
    print(f"[bench] {msg} (t+{time.time() - T0:.0f}s)", file=sys.stderr, flush=True)


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

    # BENCH_CKPT=<orbax dir>: time the pipeline on trained weights
    # instead of the random init (throughput is weight-independent, but
    # this catches numeric surprises like int8 saturation on real
    # activation statistics).
    ckpt = os.environ.get("BENCH_CKPT")
    if ckpt:
        from spacecraft_pose_estimation_tpu.train.checkpoint import CheckpointManager
        from spacecraft_pose_estimation_tpu.train.optim import build_optimizer
        from spacecraft_pose_estimation_tpu.train.state import TrainState

        st = TrainState.create(model, variables, build_optimizer("adam", 1e-3))
        restored = CheckpointManager(ckpt).restore(st)
        if restored is None:
            raise FileNotFoundError(ckpt)
        variables = {
            "params": restored[0].params,
            "batch_stats": restored[0].batch_stats,
        }
        _progress(f"loaded trained weights from {ckpt}")

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, size=(batch, h, w, 3)), jnp.uint8)
    if os.environ.get("BENCH_BOX_JITTER"):
        # realistic serving distribution: per-frame box centers/scales
        # spread over the sensor (the crop cost is data-independent —
        # the separable warp taps are recomputed per box either way —
        # so this is a credibility knob, not a different workload)
        cx = rng.uniform(500.0, 1400.0, batch)
        cy = rng.uniform(300.0, 900.0, batch)
        s = rng.uniform(250.0, 700.0, batch)
        boxes = jnp.asarray(
            np.stack([cx - s / 2, cy - s * 0.42, s, s * 0.84], axis=1), jnp.float32
        )
    else:
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
        # s2d=False: the even3/alt packed walks measured SLOWER in situ
        # (111 vs 83.6 ms/b128, probe_r3d) despite faster isolated convs
        q = quantize_hrnet(model, variables, calib, s2d=False)
        # BENCH_FOLD: 1 = fold residual adds into conv epilogues,
        # 2 = also fold the fuse-up path (see hrnet_int8.fold_residual)
        fold = int(os.environ.get("BENCH_FOLD", "0"))
        serving_model = HRNetInt8(
            model.config, fold_residual=fold >= 1, fold_fuse_up=fold >= 2
        )
        serving_vars = q
    else:
        serving_model, serving_vars = model, variables

    run = make_pose_pipeline(
        serving_model, lm3d, K, dist,
        PipelineConfig(solver="gn", refine_iters=5, crop_window=CROP_WINDOW,
                       warp_dtype=WARP_DTYPE),
    )

    from functools import partial

    @partial(jax.jit, static_argnames=("n",))
    def repeat(variables, frames, boxes, n):
        def body(carry, _):
            # carry-dependent perturbation forces truly serial execution.
            # Perturb the tiny boxes array, NOT the frames.
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


def build_full_path(det_batch=8, det_every=16, det_kind=None):
    """TRUE fused serving path: detect -> best box -> crop -> HRNet ->
    decode -> PnP, one jitted graph over a clip of det_batch*det_every
    frames from one stream.

    Serving mode: the detector runs on every det_every-th frame; its
    argmax box (1.5x-padded by the crop stage, models/rcnn.select_best_box
    semantics) is held for the following det_every-1 frames — spacecraft
    inter-frame motion is far inside the crop margin. det_every=1 gives
    the detect-EVERY-frame variant.

    det_kind: 'r101_int8' (R101-FPN serving preset + int8 PTQ backbone —
    dense convs quantize well, DEVNOTES round 2) or 'x101' (the parity
    trunk, bf16). Default from BENCH_DET env, else r101_int8.
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
        FASTER_RCNN_R101_SERVING,
        FASTER_RCNN_R101_SERVING_1OBJ,
        FASTER_RCNN_X101_SERVING,
        GeneralizedRCNN,
        select_best_box,
    )
    from spacecraft_pose_estimation_tpu.pipeline import (
        PipelineConfig,
        make_pose_pipeline,
        normalize_crops,
    )

    det_kind = det_kind or os.environ.get("BENCH_DET", "r101_1obj_int8")
    num_joints = 11
    h, w = 1200, 1920
    # 768 = the reference letterbox geometry (parity default). Lower
    # values are an EXTRA serving point (≈(768/s)^2 backbone savings),
    # clearly a different workload — label any published number with it.
    det_size = int(os.environ.get("BENCH_DET_SIZE", "768"))
    clip = det_batch * det_every

    if "1obj" in det_kind:
        det_cfg = FASTER_RCNN_R101_SERVING_1OBJ
    elif det_kind.startswith("r101"):
        det_cfg = FASTER_RCNN_R101_SERVING
    else:
        det_cfg = FASTER_RCNN_X101_SERVING
    det_model = GeneralizedRCNN(config=det_cfg, dtype=jnp.bfloat16)
    det_vars = jax.jit(lambda k: det_model.init(
        {"params": k}, jnp.zeros((1, det_size, det_size, 3)), train=False
    ))(jax.random.key(0))

    rng = np.random.default_rng(0)
    use_int8_backbone = det_kind.endswith("int8")
    if use_int8_backbone:
        from spacecraft_pose_estimation_tpu.models.backbone_int8 import (
            backbone_int8_apply,
            quantize_backbone,
        )

        mean = jnp.asarray(det_cfg.pixel_mean, jnp.float32)
        std = jnp.asarray(det_cfg.pixel_std, jnp.float32)
        calib_det = (
            jnp.asarray(rng.integers(0, 255, (2, det_size, det_size, 3)), jnp.float32)
            - mean
        ) / std
        qb = quantize_backbone(det_cfg.backbone, det_vars, calib_det)
        fold_det = int(os.environ.get("BENCH_FOLD", "0")) >= 1

        def detect(v, lb):
            feats = backbone_int8_apply(
                det_cfg.backbone, qb, (lb - mean) / std, fold_residual=fold_det
            )
            return det_model.apply(v, lb, train=False, precomputed_feats=feats)
    else:
        def detect(v, lb):
            return det_model.apply(v, lb, train=False)

    lm_model = HRNet(config=POSE_HRNET_W32.with_joints(num_joints), dtype=jnp.bfloat16)
    lm_vars = jax.jit(
        lambda k: lm_model.init(k, jnp.zeros((1, 512, 512, 3)), train=False)
    )(jax.random.key(1))
    calib = normalize_crops(
        jnp.asarray(rng.integers(0, 255, size=(4, 512, 512, 3)), jnp.float32)
    )
    q_vars = quantize_hrnet(lm_model, lm_vars, calib, s2d=False)
    fold_lm = int(os.environ.get("BENCH_FOLD", "0"))
    serving_lm = HRNetInt8(
        lm_model.config, fold_residual=fold_lm >= 1, fold_fuse_up=fold_lm >= 2
    )

    lm3d = rng.normal(size=(num_joints, 3)).astype(np.float32)
    K = np.array([[2988.6, 0, 960.0], [0, 2988.3, 600.0], [0, 0, 1]], np.float32)
    dist = np.zeros(5, np.float32)
    pose_run = make_pose_pipeline(
        serving_lm, lm3d, K, dist,
        PipelineConfig(solver="gn", refine_iters=5, crop_window=CROP_WINDOW,
                       warp_dtype=WARP_DTYPE),
    )

    frames = jnp.asarray(rng.integers(0, 255, size=(clip, h, w, 3)), jnp.uint8)
    # letterbox geometry (static): scale to fit det_size, pad bottom
    scale = det_size / max(h, w)
    lb_h, lb_w = int(round(h * scale)), int(round(w * scale))

    from functools import partial

    @partial(jax.jit, static_argnames=("n",))
    def repeat(det_vars, q_vars, frames, n):
        def body(carry, _):
            # device-side letterbox of the detector keyframes. The carry
            # perturbation rides the u8->f32 widening (an elementwise
            # producer XLA fuses into the resize read — no extra
            # materialization of the 0.7-3.5 GB clip) and sits BEFORE the
            # resize so the letterbox stage stays inside the loop: real
            # serving pays it per clip, so the marginal cost must too.
            keyframes = frames[::det_every].astype(jnp.float32) + carry * 1e-20
            lb = jax.image.resize(
                keyframes, (det_batch, lb_h, lb_w, 3), method="bilinear"
            )
            lb = jnp.pad(lb, ((0, 0), (0, det_size - lb_h), (0, det_size - lb_w), (0, 0)))
            dets = detect(det_vars, lb)
            best = select_best_box(dets, (det_size, det_size)) / scale
            boxes_xywh = jnp.stack(
                [best[:, 0], best[:, 1], best[:, 2] - best[:, 0], best[:, 3] - best[:, 1]],
                axis=1,
            )
            # hold each keyframe box for its det_every-frame window
            boxes_all = jnp.repeat(boxes_xywh, det_every, axis=0)
            out = pose_run(q_vars, frames, boxes_all)
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
    extra = {"mode": "int8_direct_serving", "batch": batch,
             "warp": f"{WARP_DTYPE}_fullframe"}

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
    # two more large graphs and a driver timeout must not lose the
    # primary number. A second, enriched JSON line replaces this one if
    # the extras complete (drivers reading either the first or the last
    # JSON line get a valid result).
    emit()

    if os.environ.get("BENCH_FULL"):
        extra["bf16_fps"] = round(measure(batch, "bf16", n_lo, n_hi), 2)
        emit()

    # TRUE full path: detect -> best box -> crop -> HRNet -> PnP in one
    # graph. Two serving points: detector on every frame, and the
    # tracked mode (detect every 16th frame, hold box).
    if not os.environ.get("BENCH_SKIP_FULL_PATH"):
        extra["det_kind"] = os.environ.get("BENCH_DET", "r101_1obj_int8")
        # det_batch=64 for the every-frame point: at det_batch=8 the
        # HRNet stage runs at batch 8 where it is latency-bound (119.9
        # fps); batching the stream amortizes both stages (measured
        # 151.8 fps at b32, 247.7 at b64 post-letterbox-fix —
        # exp_r3_batching / r3s5). The full r3s5 run (fresh process,
        # remote compiles) finished all three phases in ~37 min, inside
        # the driver window; the budget gate above still protects rc=0.
        fp_batch = int(os.environ.get("BENCH_FP_BATCH", "64"))
        for key, kwargs in (
            ("full_path_det_every_16_fps", dict(det_batch=8, det_every=16)),
            ("full_path_det_every_frame_fps", dict(det_batch=fp_batch, det_every=1)),
        ):
            if time.time() - T0 > BUDGET_S:
                extra["budget_skipped"] = key
                _progress(f"budget exceeded; skipping {key}")
                emit()
                break
            try:
                _progress(f"full path: {key}")
                extra[key] = round(measure_full_path(**kwargs), 2)
            except Exception as e:  # keep the primary metric robust
                extra[key + "_error"] = f"{type(e).__name__}: {e}"[:200]
            emit()


if __name__ == "__main__":
    main()
