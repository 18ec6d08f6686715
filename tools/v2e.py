#!/usr/bin/env python
"""Video/frames -> DVS events (v2e/v2e.py CLI equivalent).

Pipeline: read frames -> luma -> (optional SuperSloMo upsample, fixed or
flow-adaptive factor) -> emulator scan -> outputs: events CSV
(--dvs_text), AEDAT2 (--dvs_aedat2), HDF5 (--dvs_h5), numpy
(--dvs_numpy), rendered event frames + dvs-video.avi, and orig/slomo
previews (--vid_orig/--vid_slomo). Also provides `e2v` mode via
tools/e2v.py (events CSV -> frames).

Flag surface mirrors the reference's grouped argparse tree
(v2ecore/v2e_args.py:56+): camera presets --dvs128..--dvs1024, input
windowing (--start_time/--stop_time/--crop/--input_slowmotion_factor),
timestamp resolution (--auto_timestamp_resolution/--timestamp_resolution),
DVS model params incl. jitter/cov, and the output-folder management
trio (--overwrite/--unique_output_folder/--output_in_place). GUI-only
flags (--no_preview, --show_dvs_model_state) are accepted and ignored
on this headless TPU image.
"""

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spacecraft_pose_estimation_tpu.utils import maybe_force_platform

maybe_force_platform()


def load_frames(input_path: str, height: int | None, width: int | None):
    import cv2
    import numpy as np

    if os.path.isdir(input_path):
        files = sorted(
            f for f in os.listdir(input_path)
            if f.lower().endswith((".png", ".jpg", ".bmp"))
        )
        frames = []
        for f in files:
            img = cv2.imread(os.path.join(input_path, f), cv2.IMREAD_GRAYSCALE)
            if height and width:
                img = cv2.resize(img, (width, height))
            frames.append(img)
        return np.stack(frames).astype(np.float32)
    cap = cv2.VideoCapture(input_path)
    frames = []
    while True:
        ok, img = cap.read()
        if not ok:
            break
        img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        if height and width:
            img = cv2.resize(img, (width, height))
        frames.append(img)
    cap.release()
    return np.stack(frames).astype(np.float32)


def set_output_dimension(args):
    """Camera-preset geometry (v2e_utils.set_output_dimension:166-189)."""
    w, h = args.output_width, args.output_height
    if args.dvs128:
        w, h = 128, 128
    elif args.dvs240:
        w, h = 240, 180
    elif args.dvs346:
        w, h = 346, 260
    elif args.dvs640:
        w, h = 640, 480
    elif args.dvs1024:
        w, h = 1024, 768
    if w is None or h is None:
        w = h = None  # auto from source
    return w, h


def check_lowpass(cutoff_hz: float, fs: float) -> bool:
    """Warn when the IIR photoreceptor lowpass is under-sampled
    (v2e_utils.py:192-224: eps = dt/tau must stay <= 0.3 or the filter
    degenerates to mixing only the last sample). Returns True if OK."""
    if cutoff_hz <= 0 or fs <= 0:
        return True
    maxeps = 0.3
    tau = 1.0 / (2 * math.pi * cutoff_hz)
    eps = (1.0 / fs) / tau
    if eps > maxeps:
        print(
            f"WARNING: lowpass cutoff {cutoff_hz:g} Hz (tau={tau:.3g}s) is "
            f"under-sampled at fs={fs:g} Hz: IIR mixing factor "
            f"eps=dt/tau={eps:.3f} > {maxeps}; decrease "
            f"--timestamp_resolution below {tau * maxeps:.3g}s or "
            f"--cutoff_hz below {maxeps * fs / (2 * math.pi):.3g} Hz",
            file=sys.stderr,
        )
        return False
    return True


def resolve_output_folder(args) -> str:
    """--output_in_place / --overwrite / --unique_output_folder
    semantics (v2e.py output folder handling)."""
    if args.output_in_place:
        if not args.input:
            # synthetic input has no source folder to write "in place"
            raise SystemExit(
                "--output_in_place requires --input (a file/folder); "
                "use --output_folder with --synthetic_input"
            )
        return args.input if os.path.isdir(args.input) else os.path.dirname(args.input)
    folder = args.output_folder
    if os.path.isdir(folder) and os.listdir(folder) and not args.overwrite:
        if args.unique_output_folder:
            k = 1
            while os.path.isdir(f"{folder}-{k}") and os.listdir(f"{folder}-{k}"):
                k += 1
            folder = f"{folder}-{k}"
        else:
            raise SystemExit(
                f"output folder {folder} is not empty; use --overwrite or "
                "--unique_output_folder"
            )
    return folder


def write_avi(frames_u8, path, fps):
    """Grey frame stack -> avi (renderer.py:327-343 video output)."""
    import cv2
    import numpy as np

    frames_u8 = np.asarray(frames_u8)
    if frames_u8.ndim == 3:
        frames_u8 = frames_u8[..., None].repeat(3, axis=-1)
    h, w = frames_u8.shape[1:3]
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"XVID"), max(fps, 1.0), (w, h))
    for fr in frames_u8:
        vw.write(fr.astype(np.uint8))
    vw.release()


def main():
    ap = argparse.ArgumentParser(
        description="DVS event-camera simulation (v2e equivalent)"
    )
    inp = ap.add_argument_group("Input file handling")
    inp.add_argument("-i", "--input", default=None, help="video file or frames dir")
    inp.add_argument("--input_frame_rate", type=float, default=30.0)
    inp.add_argument("--input_slowmotion_factor", type=float, default=1.0,
                     help="source video is already slowed by this factor")
    inp.add_argument("--start_time", type=float, default=None)
    inp.add_argument("--stop_time", type=float, default=None)
    inp.add_argument("--crop", type=int, nargs=4, default=None,
                     metavar=("LEFT", "RIGHT", "TOP", "BOTTOM"))

    syn = ap.add_argument_group("Synthetic input")
    syn.add_argument("--synthetic_input", default=None,
                     help="python module exposing a SyntheticInput subclass")

    outg = ap.add_argument_group("Output: General")
    outg.add_argument("-o", "--output-folder", "--output_folder",
                      dest="output_folder", default="v2e-output")
    outg.add_argument("--overwrite", action="store_true")
    outg.add_argument("--unique_output_folder",
                      action=argparse.BooleanOptionalAction, default=True)
    outg.add_argument("--output_in_place", action="store_true")
    outg.add_argument("--avi_frame_rate", type=float, default=30.0)

    tsg = ap.add_argument_group("DVS timestamp resolution")
    tsg.add_argument("--auto_timestamp_resolution", action="store_true",
                     help="choose the SloMo upsampling so optical flow "
                          "<= 1 px per interpolated frame")
    tsg.add_argument("--timestamp_resolution", type=float, default=None,
                     help="desired DVS timestamp resolution in seconds")

    mdl = ap.add_argument_group("DVS model")
    mdl.add_argument("--output_height", type=int, default=None)
    mdl.add_argument("--output_width", type=int, default=None)
    mdl.add_argument("--dvs_params", choices=["clean", "noisy"], default="clean")
    mdl.add_argument("--pos_thres", type=float, default=None)
    mdl.add_argument("--neg_thres", type=float, default=None)
    mdl.add_argument("--sigma_thres", type=float, default=None)
    mdl.add_argument("--cutoff_hz", type=float, default=None)
    mdl.add_argument("--leak_rate_hz", type=float, default=None)
    mdl.add_argument("--shot_noise_rate_hz", type=float, default=None)
    mdl.add_argument("--leak_jitter_fraction", type=float, default=None)
    mdl.add_argument("--noise_rate_cov_decades", type=float, default=None)
    mdl.add_argument("--refractory_period", type=float, default=None)
    mdl.add_argument("--dvs_emulator_seed", type=int, default=None)
    mdl.add_argument("--dvs_max_iters", type=int, default=None,
                     help="static per-frame event-iteration cap of the "
                          "TPU scan (EmulatorConfig.max_iters); raise it "
                          "when the overflow warning reports clipped "
                          "events (memory scales linearly with it)")
    mdl.add_argument("--dvs_frame_chunk", type=int, default=64,
                     help="frames per emulator scan chunk; bounds device "
                          "memory at chunk*max_iters*H*W*2 bytes of dense "
                          "event maps regardless of stream length (the "
                          "emulator state carries across chunks, so the "
                          "event stream is bit-identical to one big scan)")
    mdl.add_argument("--show_dvs_model_state", nargs="*", default=None,
                     help="(GUI-only; accepted and ignored headless)")
    cam = ap.add_argument_group("DVS camera sizes")
    cam.add_argument("--dvs128", action="store_true")
    cam.add_argument("--dvs240", action="store_true")
    cam.add_argument("--dvs346", action="store_true")
    cam.add_argument("--dvs640", action="store_true")
    cam.add_argument("--dvs1024", action="store_true")

    slo = ap.add_argument_group("SloMo upsampling")
    slo.add_argument("--disable_slomo", action="store_true")
    slo.add_argument("--slomo_model", default=None,
                     help="SuperSloMo39 torch .ckpt to load")
    slo.add_argument("--slomo_upsample", type=int, default=1,
                     help="fixed SuperSloMo interpolation factor (1 = off)")
    slo.add_argument("--batch_size", type=int, default=4)
    slo.add_argument("--vid_orig", default=None,
                     help="write the (possibly resized) input as avi")
    slo.add_argument("--vid_slomo", default=None,
                     help="write the slomo-upsampled video as avi")

    vid = ap.add_argument_group("Output: DVS video")
    vid.add_argument("--dvs_exposure", nargs="+", default=["duration", "0.01"],
                     help="duration SECONDS | count N | area_count N DIM")
    vid.add_argument("--dvs_vid", default="dvs-video.avi")
    vid.add_argument("--dvs_vid_full_scale", type=int, default=2)
    vid.add_argument("--skip_video_output", action="store_true")
    vid.add_argument("--no_preview", action="store_true",
                     help="(GUI-only; accepted and ignored headless)")
    vid.add_argument("--frame_rate", type=float, default=None,
                     help="fixed event-frame rate (overrides exposure duration)")
    vid.add_argument("--no_frames", action="store_true")

    evo = ap.add_argument_group("Output: DVS events")
    evo.add_argument("--dvs_text", default=None)
    evo.add_argument("--dvs_aedat2", default=None)
    evo.add_argument("--dvs_h5", default=None)
    evo.add_argument("--dvs_numpy", default=None)
    evo.add_argument("--davis_output", action="store_true",
                     help="(unsupported, like the reference's synthetic "
                          "path: v2e.py warns and continues)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import dataclasses
    import importlib
    import time

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spacecraft_pose_estimation_tpu.events import (
        EmulatorConfig,
        emulate_sequence,
        init_state,
    )
    from spacecraft_pose_estimation_tpu.events import io as ev_io
    from spacecraft_pose_estimation_tpu.events import renderer as R
    from spacecraft_pose_estimation_tpu.events.synthetic_input import SyntheticInput

    if args.input is None and args.synthetic_input is None:
        ap.error("one of --input / --synthetic_input is required")
    if args.davis_output:
        print("WARNING: --davis_output is not supported; continuing without it")

    out_folder = resolve_output_folder(args)
    os.makedirs(out_folder, exist_ok=True)
    # write args info file (v2e_args.write_args_info semantics)
    with open(os.path.join(out_folder, "info.txt"), "w") as f:
        for k, v in sorted(vars(args).items()):
            f.write(f"{k}: {v}\n")

    t0 = time.time()
    out_w, out_h = set_output_dimension(args)
    # reference v2e.py:343: srcFrameIntervalS = (1/srcFps)/slowmotion —
    # a slow-motion SOURCE (factor>1) represents a HIGHER real-world
    # frame rate, so event time runs FASTER than playback time
    in_rate = args.input_frame_rate * max(args.input_slowmotion_factor, 1e-9)

    if args.synthetic_input:
        # "pkg.module" (first SyntheticInput subclass in the module, the
        # reference's convention) or "pkg.module:ClassName" to pick one
        # of several (e.g. events.synthetic_input:MovingBar)
        mod_name, _, cls_name = args.synthetic_input.partition(":")
        mod = importlib.import_module(mod_name)
        if cls_name:
            cls = getattr(mod, cls_name)
        else:
            cls = next(
                v for v in vars(mod).values()
                if isinstance(v, type) and issubclass(v, SyntheticInput)
                and v is not SyntheticInput
            )
        src = cls(width=out_w or 346, height=out_h or 260)
        frames, _ts = src.frames_array()
        frames = np.asarray(frames, np.float32)
        in_rate = src.frame_rate
    else:
        frames = load_frames(args.input, out_h, out_w)

    if args.start_time is not None or args.stop_time is not None:
        # windowing is in VIDEO-PLAYBACK time: the reference indexes
        # frames with the raw source fps (v2e.py:329-332), independent
        # of the slowmotion factor
        play_rate = args.input_frame_rate
        i0 = int((args.start_time or 0.0) * play_rate)
        i1 = (
            int(args.stop_time * play_rate)
            if args.stop_time is not None
            else len(frames)
        )
        frames = frames[max(i0, 0):max(i1, i0 + 2)]
    if args.crop is not None:
        left, right, top, bottom = args.crop
        h0, w0 = frames.shape[1:3]
        frames = frames[:, top:h0 - bottom or None, left:w0 - right or None]

    n, h, w = frames.shape
    print(f"loaded {n} frames of {w}x{h}")

    cfg = EmulatorConfig.preset(args.dvs_params)
    overrides = {}
    for name, field in [
        ("pos_thres", "pos_thres"), ("neg_thres", "neg_thres"),
        ("sigma_thres", "sigma_thres"), ("cutoff_hz", "cutoff_hz"),
        ("leak_rate_hz", "leak_rate_hz"), ("shot_noise_rate_hz", "shot_noise_rate_hz"),
        ("refractory_period", "refractory_period_s"),
        ("leak_jitter_fraction", "leak_jitter_fraction"),
        ("noise_rate_cov_decades", "noise_rate_cov_decades"),
        ("dvs_max_iters", "max_iters"),
    ]:
        v = getattr(args, name)
        if v is not None:
            overrides[field] = v
    cfg = dataclasses.replace(cfg, **overrides)

    if args.vid_orig:
        write_avi(np.clip(frames, 0, 255), os.path.join(out_folder, args.vid_orig),
                  args.avi_frame_rate)

    # ---- SloMo upsampling factor -----------------------------------
    upsample = max(args.slomo_upsample, 1)
    if args.timestamp_resolution is not None and not args.disable_slomo:
        upsample = max(upsample, int(np.ceil(1.0 / (in_rate * args.timestamp_resolution))))
    use_auto = args.auto_timestamp_resolution and not args.disable_slomo
    if args.disable_slomo:
        upsample = 1

    if upsample > 1 or use_auto:
        from spacecraft_pose_estimation_tpu.events.slomo import (
            SuperSloMo,
            auto_upsampling_factor,
            interpolate_pair,
        )

        # the SuperSloMo UNet's skip connections need 32-multiple dims;
        # edge-pad for the interpolation stage, crop back after
        ph = (-h) % 32
        pw = (-w) % 32
        slomo_frames = np.pad(frames, ((0, 0), (0, ph), (0, pw)), mode="edge")
        model = SuperSloMo()
        f01 = jnp.asarray(slomo_frames[:1, :, :, None] / 255.0)
        variables = model.init(jax.random.key(0), f01, f01, jnp.asarray([0.5]))
        if args.slomo_model:
            import torch

            from spacecraft_pose_estimation_tpu.events.slomo import slomo_torch_to_flax

            ckpt = torch.load(args.slomo_model, map_location="cpu")
            variables = {"params": slomo_torch_to_flax(ckpt)}
            print(f"loaded SuperSloMo weights from {args.slomo_model}")
        if use_auto:
            # flow probe over all source pairs -> one conservative global
            # factor (the reference picks per-batch factors,
            # slomo.py:231-360; a global max is the fixed-shape
            # equivalent: at least as finely interpolated everywhere)
            flow_fn = jax.jit(
                lambda a, b: jnp.max(jnp.abs(
                    model.apply(variables, a, b, jnp.full((a.shape[0],), 0.5),
                                return_flow=True)
                ))
            )
            mf = 0.0
            for i in range(0, n - 1, args.batch_size):
                a = jnp.asarray(slomo_frames[i:i + args.batch_size, :, :, None] / 255.0)
                b = jnp.asarray(slomo_frames[i + 1:i + 1 + args.batch_size, :, :, None] / 255.0)
                m = min(len(a), len(b))
                mf = max(mf, float(flow_fn(a[:m], b[:m])))
            upsample = max(upsample, int(auto_upsampling_factor(jnp.asarray(mf))))
            print(f"auto timestamp resolution: max flow {mf:.2f} px -> "
                  f"upsampling {upsample}x")
        # reference schedule (slomo.py:405-433): each source pair yields
        # `upsampling_factor` midpoint frames at t=(i+0.5)/U; source
        # frames themselves are not re-emitted
        out_frames = []
        for i in range(n - 1):
            a = jnp.asarray(slomo_frames[i: i + 1, :, :, None] / 255.0)
            b = jnp.asarray(slomo_frames[i + 1: i + 2, :, :, None] / 255.0)
            mids = interpolate_pair(model, variables, a, b, upsample)
            out_frames.extend(np.asarray(mids)[:, 0, :h, :w, 0] * 255.0)
        frames = np.stack(out_frames)
        n = len(frames)
        print(f"slomo upsampled to {n} frames"
              + ("" if args.slomo_model else
                 " (untrained weights — pass --slomo_model for real interpolation)"))
        if args.vid_slomo:
            write_avi(np.clip(frames, 0, 255),
                      os.path.join(out_folder, args.vid_slomo), args.avi_frame_rate)

    dt = 1.0 / (in_rate * max(upsample, 1))
    timestamps = np.arange(n) * dt
    check_lowpass(cfg.cutoff_hz, 1.0 / dt)
    # the emulator scan runs in float32 (no x64 on this path): warn when
    # the f32 grid near the end of the stream becomes a meaningful
    # fraction of dt (long/high-resolution streams should be chunked)
    f32_ulp = float(np.spacing(np.float32(timestamps[-1]))) if n > 1 else 0.0
    if f32_ulp > 0.01 * dt:
        print(
            f"WARNING: float32 timestamp resolution at t={timestamps[-1]:.1f}s "
            f"is {f32_ulp:.2e}s = {f32_ulp / dt:.1%} of the {dt:.2e}s frame "
            "interval; event timestamps will quantize. Process the stream in "
            "shorter --start_time/--stop_time windows.",
            file=sys.stderr,
        )

    seed = args.dvs_emulator_seed if args.dvs_emulator_seed is not None else args.seed
    state = init_state(jnp.asarray(frames[0]), jax.random.key(seed), cfg)
    # Chunked scan: the dense (T, max_iters, H, W) polarity maps are the
    # memory hot spot (one uncapped scan over a 240-frame 480p stream at
    # max_iters=16 ResourceExhausts a 16 GB chip). The emulator state is
    # an explicit carry, so chunking is bit-identical to one scan; each
    # chunk's maps are converted to sparse events on the host and freed.
    # Chunk timestamps are monotone, so per-chunk sorted events
    # concatenate into a globally sorted stream.
    chunk = max(int(args.dvs_frame_chunk), 1)
    # Resolve the render mode up front: DURATION windows accumulate
    # chunk-by-chunk (additive segment sums, O(chunk) device memory);
    # COUNT/AREA_COUNT bin by global cumulative iteration counts, so
    # their dense maps are staged to host RAM instead (host-bounded,
    # device still O(chunk)).
    render_mode = None
    dur_exposure = None
    dur_num_out = 0
    dur_acc_sum = None
    map_parts: list = []
    if not args.no_frames:
        render_mode = args.dvs_exposure[0]
        if args.frame_rate is not None:
            render_mode = "duration"
            dur_exposure = 1.0 / args.frame_rate
        elif render_mode == "duration":
            dur_exposure = float(args.dvs_exposure[1])
        if render_mode == "duration":
            dur_num_out = max(int(np.ceil(timestamps[-1] / dur_exposure)), 1)

    total_events = 0
    overflow = 0
    ev_parts = []
    for i in range(1, len(frames), chunk):
        f = jnp.asarray(frames[i : i + chunk])
        t = jnp.asarray(timestamps[i : i + chunk], jnp.float32)
        state, out = emulate_sequence(state, f, t, cfg)
        total_events += int(np.asarray(out["num_events"]).sum())
        overflow += int(np.asarray(out["overflow"]).sum())
        ev_parts.append(
            ev_io.dense_to_events(
                out["pos"], out["neg"], out["ts"], out["iter_valid"]
            )
        )
        if render_mode == "duration":
            acc = R.duration_acc(
                out["pos"], out["neg"], out["ts"], out["iter_valid"],
                jnp.asarray(0.0), dur_exposure, dur_num_out,
            )
            dur_acc_sum = acc if dur_acc_sum is None else dur_acc_sum + acc
        elif render_mode is not None:
            map_parts.append(
                tuple(np.asarray(out[k]) for k in ("pos", "neg", "ts", "iter_valid"))
            )
        del out
    if overflow > 0:
        print(
            f"WARNING: {overflow} events were clipped by the static "
            f"max_iters={cfg.max_iters} cap (deferred to later frames; "
            "timestamps skew by up to one frame interval). Raise "
            "--dvs_max_iters or the SloMo upsampling.",
            file=sys.stderr,
        )
    sim_time = time.time() - t0
    video_time = timestamps[-1]
    print(
        f"emulated {total_events} events over {video_time:.3f}s of video in "
        f"{sim_time:.2f}s wall ({sim_time / max(video_time, 1e-9):.1f}x real time)"
    )

    events = (
        np.concatenate(ev_parts, axis=0) if ev_parts else np.zeros((0, 4))
    )
    if args.dvs_text:
        ev_io.write_events_csv(events, os.path.join(out_folder, args.dvs_text))
    if args.dvs_h5:
        ev_io.write_events_h5(events, os.path.join(out_folder, args.dvs_h5))
    if args.dvs_numpy:
        np.save(os.path.join(out_folder, args.dvs_numpy), np.asarray(events))
    if args.dvs_aedat2:
        # smallest supported jAER geometry that fits; NO silent fallback
        # (an undersized geometry corrupts the packed y addresses — the
        # reference raises for unsupported sizes too)
        fits = sorted(
            (sz for sz in ev_io.AEDAT2_SIZES if sz[0] >= w and sz[1] >= h),
            key=lambda sz: sz[0] * sz[1],
        )
        if not fits:
            raise SystemExit(
                f"--dvs_aedat2: no supported AEDAT2 camera geometry fits "
                f"{w}x{h} (supported: {sorted(ev_io.AEDAT2_SIZES)})"
            )
        wr = ev_io.AEDat2Writer(os.path.join(out_folder, args.dvs_aedat2), *fits[0])
        wr.append(events)
        wr.close()

    if not args.no_frames:
        mode = render_mode
        frames_dir = os.path.join(out_folder, "event-frames")
        os.makedirs(frames_dir, exist_ok=True)
        if mode == "duration":
            exposure = dur_exposure
            num_out = dur_num_out
            imgs = R.finalize_duration(dur_acc_sum, args.dvs_vid_full_scale)
            times = (np.arange(num_out) + 1) * exposure
        else:
            # COUNT / AREA_COUNT close windows on global cumulative
            # counts: feed the host-staged maps back in one pass
            pos_m, neg_m, ts_m, iv_m = (
                np.concatenate([p[k] for p in map_parts], axis=0)
                for k in range(4)
            )
            if mode == "count":
                count = int(args.dvs_exposure[1])
                num_out = max(total_events // max(count, 1), 1)
                imgs, times = R.render_count(
                    pos_m, neg_m, ts_m, iv_m, count, num_out,
                    full_scale_count=args.dvs_vid_full_scale,
                )
                times = np.asarray(times)
            else:
                count, dim = int(args.dvs_exposure[1]), int(args.dvs_exposure[2])
                num_out = 64
                imgs, times = R.render_area_count(
                    pos_m, neg_m, ts_m, iv_m, count, dim, num_out,
                    full_scale_count=args.dvs_vid_full_scale,
                )
                times = np.asarray(times)
        u8_stack = []
        for img, t in zip(np.asarray(imgs), np.atleast_1d(times)):
            if not np.isfinite(t):
                continue
            u8 = (np.asarray(img) * 255).astype(np.uint8)
            u8_stack.append(u8)
            cv2.imwrite(os.path.join(frames_dir, f"{t * 1e3:.0f}.bmp"),
                        cv2.cvtColor(u8, cv2.COLOR_GRAY2BGR))
        print(f"wrote event frames to {frames_dir}")
        if u8_stack and not args.skip_video_output:
            avi = os.path.join(out_folder, args.dvs_vid)
            write_avi(np.stack(u8_stack), avi, args.avi_frame_rate)
            print(f"wrote {avi}")

    # end-of-run desktop integration (v2e.py:793-808): notify + show the
    # output folder — headless-safe no-ops on a TPU pod
    from spacecraft_pose_estimation_tpu.events import desktop

    desktop.notify("v2e done", f"{total_events} events -> {out_folder}")
    if not args.skip_video_output and not args.no_preview:
        desktop.open(os.path.abspath(out_folder))


if __name__ == "__main__":
    main()
