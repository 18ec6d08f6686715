"""v2e emulator throughput on TPU vs the reference's own headline.

The vendored v2e README (BASELINE.md rows) claims DVS simulation runs
50-200x SLOWER than real time on a GTX-1050, and ~500 s per 1 s of
source video in the extreme-upsampling case. This bench measures the
TPU scan emulator's realtime factor at DAVIS346 resolution with the
noisy-camera model (IIR lowpass + leak + shot noise + refractory), at
a 10 kHz interpolated frame rate (the extreme-upsampling regime).

Reported: x_realtime = simulated_seconds / wall_seconds (>1 = faster
than real time), plus Mev/s emitted.
"""
import os, sys, time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

from spacecraft_pose_estimation_tpu.events.emulator import (
    EmulatorConfig,
    emulate_sequence,
    init_state,
)

H = int(os.environ.get("BV2E_H", "260"))
W = int(os.environ.get("BV2E_W", "346"))   # DAVIS346
T = int(os.environ.get("BV2E_T", "1000"))  # interpolated frames per chunk
DT = 1e-4                # 10 kHz (slomo extreme upsampling)
N_LO, N_HI = 2, 6

cfg = EmulatorConfig(
    pos_thres=0.2, neg_thres=0.2, sigma_thres=0.03,
    cutoff_hz=300.0, leak_rate_hz=0.01, shot_noise_rate_hz=0.001,
    refractory_period_s=0.0005, max_iters=8,
)

rng = np.random.default_rng(0)
# moving-edge scene: enough contrast change to emit events every frame
xs = np.linspace(0, 4 * np.pi, T, dtype=np.float32)
base = rng.uniform(0.2, 0.8, (H, W)).astype(np.float32)
frames = jnp.asarray(
    np.clip(base[None] + 0.3 * np.sin(xs[:, None, None] * 3 + np.linspace(0, 8, W)[None, None, :]), 0, 1) * 255.0
)
timestamps = jnp.asarray(np.arange(T, dtype=np.float32) * DT)

state0 = init_state(frames[0], jax.random.key(0), cfg)


@partial(jax.jit, static_argnames="n")
def repeat(state, frames, timestamps, n):
    def body(carry, _):
        st, acc = carry
        st2, out = emulate_sequence(st, frames + acc * 1e-20, timestamps, cfg)
        ev = jnp.sum(out["pos"].astype(jnp.int32)) + jnp.sum(out["neg"].astype(jnp.int32))
        return (st2, acc + ev.astype(jnp.float32) * 1e-20), ev

    (st, acc), evs = jax.lax.scan(body, (state, jnp.float32(0.0)), None, length=n)
    return acc + jnp.sum(evs).astype(jnp.float32) * 1e-30, jnp.sum(evs)


def timed(n):
    t0 = time.perf_counter()
    acc, evs = repeat(state0, frames, timestamps, n)
    _ = float(acc)
    return time.perf_counter() - t0, int(evs)


timed(N_LO)
timed(N_HI)
t_lo = min(timed(N_LO)[0] for _ in range(3))
t_hi, n_events = min((timed(N_HI) for _ in range(3)), key=lambda p: p[0])
dt_chunk = (t_hi - t_lo) / (N_HI - N_LO)
sim_s = T * DT
ev_per_chunk = n_events / N_HI
print(f"emulator chunk (T={T} frames {H}x{W} @ {1/DT:.0f} Hz): {dt_chunk*1e3:.2f} ms", flush=True)
print(f"x_realtime: {sim_s / dt_chunk:.2f} (reference GPU: 0.005-0.02)", flush=True)
print(f"events: {ev_per_chunk/1e6:.2f} Mev/chunk -> {ev_per_chunk/dt_chunk/1e6:.1f} Mev/s", flush=True)
print(f"interp frames/s: {T/dt_chunk:.0f}", flush=True)
