"""Synthetic event source -> emulator integration (moving-dot validation)."""

import numpy as np

import jax
import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.events import (
    EmulatorConfig,
    emulate_sequence,
    init_state,
)
from spacecraft_pose_estimation_tpu.events.synthetic_input import MovingDot


class TestMovingDot:
    def test_frames(self):
        src = MovingDot(width=32, height=32, num_frames=20)
        frames, ts = src.frames_array()
        assert frames.shape == (20, 32, 32)
        assert float(frames.max()) == 250.0
        assert np.all(np.diff(ts) > 0)

    def test_emulator_fires_on_motion(self):
        src = MovingDot(width=32, height=32, num_frames=30, frame_rate=200.0)
        frames, ts = src.frames_array()
        cfg = EmulatorConfig(pos_thres=0.2, neg_thres=0.2, sigma_thres=0.0, max_iters=8)
        state = init_state(jnp.asarray(frames[0]), jax.random.key(0), cfg)
        _, out = emulate_sequence(state, jnp.asarray(frames[1:]), jnp.asarray(ts[1:]), cfg)
        total = int(np.asarray(out["num_events"]).sum())
        # the dot moves every frame: ON events at the leading edge, OFF at
        # the trailing edge, roughly balanced
        on = int(np.asarray(out["pos"]).sum())
        off = int(np.asarray(out["neg"]).sum())
        assert total > 500
        assert 0.5 < on / max(off, 1) < 2.0
