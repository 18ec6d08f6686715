"""Synthetic event source -> emulator integration (moving-dot validation)."""

import numpy as np

import jax
import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.events import (
    EmulatorConfig,
    emulate_sequence,
    init_state,
)
from spacecraft_pose_estimation_tpu.events.synthetic_input import (
    MovingBar,
    MovingDot,
    ParticleField,
)


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


class TestMovingBar:
    def test_analytic_event_count(self):
        """Constant-speed edge: each pixel's intensity steps bg->fg->bg
        once per transit, so ON and OFF totals are near-equal and scale
        with the swept area."""
        src = MovingBar(width=32, height=16, num_frames=40,
                        speed_px_per_frame=1.0, frame_rate=500.0)
        frames, ts = src.frames_array()
        assert frames.shape == (40, 16, 32)
        cfg = EmulatorConfig(pos_thres=0.2, neg_thres=0.2, sigma_thres=0.0,
                             max_iters=16)
        state = init_state(jnp.asarray(frames[0]), jax.random.key(0), cfg)
        _, out = emulate_sequence(state, jnp.asarray(frames[1:]),
                                  jnp.asarray(ts[1:]), cfg)
        on = int(np.asarray(out["pos"]).sum())
        off = int(np.asarray(out["neg"]).sum())
        # ln(250/10)/0.2 ~ 16 events per edge crossing per pixel; the bar
        # sweeps 39 columns x 16 rows of leading+trailing edges
        assert on > 3000 and off > 3000
        assert 0.8 < on / off < 1.25

    def test_wraps(self):
        src = MovingBar(width=16, height=4, num_frames=60, bar_width=2,
                        speed_px_per_frame=1.0)
        f0 = src.frame(0)
        fwrap = src.frame(18)  # 18 % (16+2) == 0 -> same phase
        np.testing.assert_array_equal(f0, fwrap)


class TestParticleField:
    def test_deterministic_and_moving(self):
        a = ParticleField(width=32, height=32, num_frames=10, seed=3)
        b = ParticleField(width=32, height=32, num_frames=10, seed=3)
        np.testing.assert_array_equal(a.frame(4), b.frame(4))
        assert not np.array_equal(a.frame(0), a.frame(5))

    def test_emulator_fires(self):
        src = ParticleField(width=32, height=32, num_frames=20,
                            num_particles=12, frame_rate=300.0)
        frames, ts = src.frames_array()
        cfg = EmulatorConfig(pos_thres=0.25, neg_thres=0.25,
                             sigma_thres=0.0, max_iters=8)
        state = init_state(jnp.asarray(frames[0]), jax.random.key(0), cfg)
        _, out = emulate_sequence(state, jnp.asarray(frames[1:]),
                                  jnp.asarray(ts[1:]), cfg)
        assert int(np.asarray(out["num_events"]).sum()) > 200
