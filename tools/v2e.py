#!/usr/bin/env python
"""Video/frames -> DVS events (v2e/v2e.py CLI equivalent).

Pipeline: read frames -> luma -> (optional SuperSloMo upsample) ->
emulator scan -> outputs: events CSV (--dvs_text), AEDAT2 (--dvs_aedat2),
HDF5 (--dvs_h5), and rendered event frames (duration exposure).
Also provides `e2v` mode: events CSV -> frames (v2e/e2v.py).
"""

import argparse
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-i", "--input", required=True, help="video file or frames dir")
    ap.add_argument("-o", "--output-folder", required=True)
    ap.add_argument("--input_frame_rate", type=float, default=30.0)
    ap.add_argument("--output_height", type=int, default=None)
    ap.add_argument("--output_width", type=int, default=None)
    ap.add_argument("--dvs_params", choices=["clean", "noisy"], default="clean")
    ap.add_argument("--pos_thres", type=float, default=None)
    ap.add_argument("--neg_thres", type=float, default=None)
    ap.add_argument("--sigma_thres", type=float, default=None)
    ap.add_argument("--cutoff_hz", type=float, default=None)
    ap.add_argument("--leak_rate_hz", type=float, default=None)
    ap.add_argument("--shot_noise_rate_hz", type=float, default=None)
    ap.add_argument("--refractory_period", type=float, default=None)
    ap.add_argument("--slomo_upsample", type=int, default=1,
                    help="SuperSloMo interpolation factor (1 = off)")
    ap.add_argument("--dvs_exposure", nargs="+", default=["duration", "0.01"],
                    help="duration SECONDS | count N | area_count N DIM")
    ap.add_argument("--dvs_text", default=None)
    ap.add_argument("--dvs_aedat2", default=None)
    ap.add_argument("--dvs_h5", default=None)
    ap.add_argument("--no_frames", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import dataclasses
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

    os.makedirs(args.output_folder, exist_ok=True)
    # write args info file (v2e_args.write_args_info semantics)
    with open(os.path.join(args.output_folder, "info.txt"), "w") as f:
        for k, v in sorted(vars(args).items()):
            f.write(f"{k}: {v}\n")

    t0 = time.time()
    frames = load_frames(args.input, args.output_height, args.output_width)
    n, h, w = frames.shape
    print(f"loaded {n} frames of {w}x{h}")

    cfg = EmulatorConfig.preset(args.dvs_params)
    overrides = {}
    for name, field in [
        ("pos_thres", "pos_thres"), ("neg_thres", "neg_thres"),
        ("sigma_thres", "sigma_thres"), ("cutoff_hz", "cutoff_hz"),
        ("leak_rate_hz", "leak_rate_hz"), ("shot_noise_rate_hz", "shot_noise_rate_hz"),
        ("refractory_period", "refractory_period_s"),
    ]:
        v = getattr(args, name)
        if v is not None:
            overrides[field] = v
    cfg = dataclasses.replace(cfg, **overrides)

    if args.slomo_upsample > 1:
        from spacecraft_pose_estimation_tpu.events.slomo import SuperSloMo, interpolate_pair

        model = SuperSloMo()
        f01 = jnp.asarray(frames[:1, :, :, None] / 255.0)
        variables = model.init(jax.random.key(0), f01, f01, jnp.asarray([0.5]))
        # reference schedule (slomo.py:405-433): each source pair yields
        # `upsampling_factor` midpoint frames at t=(i+0.5)/U; source
        # frames themselves are not re-emitted
        out_frames = []
        for i in range(n - 1):
            a = jnp.asarray(frames[i : i + 1, :, :, None] / 255.0)
            b = jnp.asarray(frames[i + 1 : i + 2, :, :, None] / 255.0)
            mids = interpolate_pair(model, variables, a, b, args.slomo_upsample)
            out_frames.extend(np.asarray(mids)[:, 0, :, :, 0] * 255.0)
        frames = np.stack(out_frames)
        n = len(frames)
        print(f"slomo upsampled to {n} frames "
              "(untrained weights unless a checkpoint is loaded)")

    dt = 1.0 / (args.input_frame_rate * max(args.slomo_upsample, 1))
    timestamps = np.arange(n) * dt

    state = init_state(jnp.asarray(frames[0]), jax.random.key(args.seed), cfg)
    state, out = emulate_sequence(
        state, jnp.asarray(frames[1:]), jnp.asarray(timestamps[1:], jnp.float32), cfg
    )
    total_events = int(np.asarray(out["num_events"]).sum())
    sim_time = time.time() - t0
    video_time = timestamps[-1]
    print(
        f"emulated {total_events} events over {video_time:.3f}s of video in "
        f"{sim_time:.2f}s wall ({sim_time / max(video_time, 1e-9):.1f}x real time)"
    )

    events = ev_io.dense_to_events(out["pos"], out["neg"], out["ts"], out["iter_valid"])
    if args.dvs_text:
        ev_io.write_events_csv(events, os.path.join(args.output_folder, args.dvs_text))
    if args.dvs_h5:
        ev_io.write_events_h5(events, os.path.join(args.output_folder, args.dvs_h5))
    if args.dvs_aedat2:
        wr = ev_io.AEDat2Writer(
            os.path.join(args.output_folder, args.dvs_aedat2), 346, 260
        ) if (w, h) == (346, 260) else None
        if wr is None:
            sizes = [(346, 260), (640, 480), (1280, 720), (240, 180)]
            match = next(((sw, sh) for sw, sh in sizes if sw >= w and sh >= h), (1280, 720))
            wr = ev_io.AEDat2Writer(os.path.join(args.output_folder, args.dvs_aedat2), *match)
        wr.append(events)
        wr.close()

    if not args.no_frames:
        mode = args.dvs_exposure[0]
        frames_dir = os.path.join(args.output_folder, "event-frames")
        os.makedirs(frames_dir, exist_ok=True)
        if mode == "duration":
            exposure = float(args.dvs_exposure[1])
            num_out = max(int(np.ceil(video_time / exposure)), 1)
            imgs = R.render_duration(
                out["pos"], out["neg"], out["ts"], out["iter_valid"],
                jnp.asarray(0.0), exposure, num_out,
            )
            times = (np.arange(num_out) + 1) * exposure
        elif mode == "count":
            count = int(args.dvs_exposure[1])
            num_out = max(total_events // max(count, 1), 1)
            imgs, times = R.render_count(
                out["pos"], out["neg"], out["ts"], out["iter_valid"], count, num_out
            )
            times = np.asarray(times)
        else:
            count, dim = int(args.dvs_exposure[1]), int(args.dvs_exposure[2])
            num_out = 64
            imgs, times = R.render_area_count(
                out["pos"], out["neg"], out["ts"], out["iter_valid"], count, dim, num_out
            )
            times = np.asarray(times)
        for img, t in zip(np.asarray(imgs), np.atleast_1d(times)):
            if not np.isfinite(t):
                continue
            u8 = (img * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(frames_dir, f"{t * 1e3:.0f}.bmp"),
                        cv2.cvtColor(u8, cv2.COLOR_GRAY2BGR))
        print(f"wrote event frames to {frames_dir}")


if __name__ == "__main__":
    main()
