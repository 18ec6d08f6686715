"""Event simulator subsystem tests: emulator physics, renderer, IO, slomo."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spacecraft_pose_estimation_tpu.events import (
    EmulatorConfig,
    emulate_frame,
    emulate_sequence,
    init_state,
)
from spacecraft_pose_estimation_tpu.events import io as ev_io
from spacecraft_pose_estimation_tpu.events import renderer as R
from spacecraft_pose_estimation_tpu.events.emulator import lin_log
from spacecraft_pose_estimation_tpu.events.slomo import SuperSloMo, backwarp, interpolate_pair


CLEAN = EmulatorConfig(pos_thres=0.2, neg_thres=0.2, sigma_thres=0.0, max_iters=6)


class TestLinLog:
    def test_linear_below_threshold(self):
        x = jnp.asarray([0.0, 10.0, 20.0])
        y = np.asarray(lin_log(x))
        f = np.log(20) / 20
        np.testing.assert_allclose(y, [0.0, 10 * f, np.log(20)], atol=1e-6)

    def test_log_above(self):
        np.testing.assert_allclose(float(lin_log(jnp.asarray(100.0))), np.log(100), atol=1e-6)

    def test_rounding_reversibility(self):
        y = lin_log(jnp.asarray(123.0))
        assert float(y) == float(jnp.round(y * 1e8) / 1e8)


class TestEmulator:
    def test_no_change_no_events(self):
        frame = jnp.full((16, 16), 128.0)
        state = init_state(frame, jax.random.key(0), CLEAN)
        state, out = emulate_frame(state, frame, jnp.asarray(0.1), CLEAN)
        assert int(out["num_events"]) == 0

    def test_brightness_step_fires_on_events(self):
        f0 = jnp.full((8, 8), 50.0)
        f1 = jnp.full((8, 8), 120.0)  # log diff ~ 0.875 -> 4 events @0.2
        state = init_state(f0, jax.random.key(0), CLEAN)
        state, out = emulate_frame(state, f1, jnp.asarray(0.05), CLEAN)
        expected_per_pixel = int(np.floor((np.log(120) - np.log(50)) / 0.2))
        assert int(out["pos"].sum()) == expected_per_pixel * 64
        assert int(out["neg"].sum()) == 0

    def test_off_events_follow_on_events(self):
        """After a step up then back down, OFF events mirror ON events
        (the lin_log rounding exists to guarantee this)."""
        cfg = CLEAN
        f0 = jnp.full((4, 4), 60.0)
        f1 = jnp.full((4, 4), 140.0)
        state = init_state(f0, jax.random.key(0), cfg)
        state, out1 = emulate_frame(state, f1, jnp.asarray(0.05), cfg)
        state, out2 = emulate_frame(state, f0, jnp.asarray(0.10), cfg)
        assert int(out1["pos"].sum()) > 0
        assert int(out2["neg"].sum()) == int(out1["pos"].sum())

    def test_base_frame_moves_only_by_emitted(self):
        cfg = dataclasses.replace(CLEAN, max_iters=2)  # cap forces clipping
        f0 = jnp.full((4, 4), 30.0)
        f1 = jnp.full((4, 4), 200.0)  # giant step, > max_iters events
        state0 = init_state(f0, jax.random.key(0), cfg)
        state1, out = emulate_frame(state0, f1, jnp.asarray(0.05), cfg)
        emitted = int(out["pos"].sum()) // 16
        np.testing.assert_allclose(
            np.asarray(state1.base_log),
            np.asarray(state0.base_log) + emitted * 0.2,
            atol=1e-5,
        )

    def test_sequence_scan(self):
        rng = np.random.default_rng(0)
        frames = jnp.asarray(rng.uniform(0, 255, size=(5, 8, 8)).astype(np.float32))
        ts = jnp.asarray(np.arange(1, 6) * 0.03, jnp.float32)
        state = init_state(frames[0], jax.random.key(0), CLEAN)
        state, out = emulate_sequence(state, frames[1:], ts[1:], CLEAN)
        assert out["pos"].shape == (4, 6, 8, 8)
        assert int(out["num_events"].sum()) > 0

    def test_leak_and_shot_noise_generate_events(self):
        cfg = dataclasses.replace(
            CLEAN, leak_rate_hz=5.0, shot_noise_rate_hz=50.0, sigma_thres=0.03
        )
        frame = jnp.full((32, 32), 128.0)
        state = init_state(frame, jax.random.key(1), cfg)
        total = 0
        for i in range(5):
            state, out = emulate_frame(state, frame, jnp.asarray(0.05 * (i + 1)), cfg)
            total += int(out["num_events"])
        assert total > 0  # noise processes fire with static input


class TestRenderer:
    def _dense(self):
        rng = np.random.default_rng(1)
        T, I, H, W = 6, 3, 8, 8
        pos = jnp.asarray(rng.uniform(size=(T, I, H, W)) < 0.2)
        neg = jnp.asarray(rng.uniform(size=(T, I, H, W)) < 0.2)
        ts = jnp.asarray(np.cumsum(np.full((T * I,), 0.01)).reshape(T, I), jnp.float32)
        valid = jnp.ones((T, I), bool)
        return pos, neg, ts, valid

    def test_duration_mode(self):
        pos, neg, ts, valid = self._dense()
        frames = R.render_duration(pos, neg, ts, valid, jnp.asarray(0.0), 0.06, 3)
        assert frames.shape == (3, 8, 8)
        assert float(frames.min()) >= 0.0 and float(frames.max()) <= 1.0
        # zero events -> grey 0.5
        empty = R.render_duration(
            jnp.zeros_like(pos), jnp.zeros_like(neg), ts, valid, jnp.asarray(0.0), 0.06, 3
        )
        np.testing.assert_allclose(np.asarray(empty), 0.5)

    def test_count_mode(self):
        pos, neg, ts, valid = self._dense()
        frames, ends = R.render_count(pos, neg, ts, valid, count=30, num_frames=4)
        assert frames.shape == (4, 8, 8)
        assert np.all(np.diff(np.asarray(ends)[np.isfinite(np.asarray(ends))]) >= 0)

    def test_area_count_mode(self):
        pos, neg, ts, valid = self._dense()
        frames, _ = R.render_area_count(
            pos, neg, ts, valid, area_count=10, area_dimension=4, num_frames=4
        )
        assert frames.shape == (4, 8, 8)


class TestIO:
    def _events(self):
        rng = np.random.default_rng(2)
        n = 100
        t = np.sort(rng.uniform(0, 1, n))
        x = rng.integers(0, 346, n)
        y = rng.integers(0, 260, n)
        p = rng.choice([-1, 1], n)
        return np.stack([t, x, y, p], axis=1).astype(np.float64)

    def test_dense_to_events_roundtrip_counts(self):
        rng = np.random.default_rng(3)
        pos = rng.uniform(size=(2, 3, 4, 4)) < 0.3
        neg = rng.uniform(size=(2, 3, 4, 4)) < 0.3
        ts = np.cumsum(np.full(6, 0.01)).reshape(2, 3)
        valid = np.ones((2, 3), bool)
        ev = ev_io.dense_to_events(pos, neg, ts, valid)
        assert len(ev) == pos.sum() + neg.sum()
        assert np.all(np.diff(ev[:, 0]) >= 0)

    def test_csv_roundtrip(self, tmp_path):
        ev = self._events()
        p = str(tmp_path / "events.csv")
        ev_io.write_events_csv(ev, p)
        back = ev_io.read_events_csv(p, force_pos_polarity=False)
        np.testing.assert_allclose(back[:, 0], ev[:, 0], atol=1e-8)
        np.testing.assert_array_equal(back[:, 1:3], ev[:, 1:3])
        np.testing.assert_array_equal(back[:, 3], ev[:, 3])

    def test_csv_e2v_semantics(self, tmp_path):
        ev = self._events()
        p = str(tmp_path / "events.csv")
        ev_io.write_events_csv(ev, p)
        back = ev_io.read_events_csv(p, timestamp_unit="ms", swap_xy=True)
        np.testing.assert_allclose(back[:, 0], ev[:, 0] * 1e-3, atol=1e-10)
        np.testing.assert_array_equal(back[:, 1], ev[:, 2])
        assert np.all(back[:, 3] == 1.0)

    def test_aedat2_roundtrip(self, tmp_path):
        ev = self._events()
        p = str(tmp_path / "out.aedat")
        w = ev_io.AEDat2Writer(p, 346, 260)
        w.append(ev)
        w.close()
        back = ev_io.read_aedat2(p, 346, 260)
        np.testing.assert_allclose(back[:, 0], (1e6 * ev[:, 0]).astype(np.int32) / 1e6)
        np.testing.assert_array_equal(back[:, 1], ev[:, 1])
        np.testing.assert_array_equal(back[:, 2], ev[:, 2])
        np.testing.assert_array_equal(back[:, 3], ev[:, 3])

    def test_h5_roundtrip(self, tmp_path):
        ev = self._events()
        p = str(tmp_path / "events.h5")
        ev_io.write_events_h5(ev, p)
        back = ev_io.read_events_h5(p)
        np.testing.assert_array_equal(back[:, 1:3], ev[:, 1:3])


class TestSloMo:
    def test_backwarp_identity(self):
        rng = np.random.default_rng(4)
        img = jnp.asarray(rng.uniform(size=(1, 16, 16, 1)).astype(np.float32))
        out = backwarp(img, jnp.zeros((1, 16, 16, 2)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)

    def test_backwarp_shift(self):
        img = jnp.zeros((1, 8, 8, 1)).at[0, 4, 4, 0].set(1.0)
        flow = jnp.ones((1, 8, 8, 2))  # sample from (x+1, y+1)
        out = backwarp(img, flow)
        assert float(out[0, 3, 3, 0]) == pytest.approx(1.0)

    @pytest.mark.slow
    def test_interpolation_shapes(self):
        model = SuperSloMo()
        f0 = jnp.zeros((1, 32, 32, 1))
        f1 = jnp.ones((1, 32, 32, 1))
        variables = model.init(jax.random.key(0), f0, f1, jnp.asarray([0.5]))
        mids = interpolate_pair(model, variables, f0, f1, 3)
        assert mids.shape == (3, 1, 32, 32, 1)
        assert np.isfinite(np.asarray(mids)).all()


class TestRound3EventFixes:
    def test_lin_log_snaps_to_exact_f32_grid(self):
        """The snap grid must actually QUANTIZE in float32 (the
        reference's 1e-8 grid needs float64 and was a silent no-op
        here): every output is an exact multiple of 2^-21."""
        x = jnp.asarray(np.linspace(0.5, 255.0, 997), jnp.float32)
        y = np.asarray(lin_log(x), np.float64)
        scaled = y * (2 ** 21)
        np.testing.assert_array_equal(scaled, np.round(scaled))
        # distinct brightnesses still map to distinct values
        assert len(np.unique(y)) > 900

    def test_zero_event_frame_emits_no_shot_noise(self):
        """Static input with shot noise enabled: the reference's
        per-frame loop runs zero iterations (emulator.py:468), so no
        events — signal or noise — are emitted."""
        import dataclasses as dc

        cfg = dc.replace(CLEAN, shot_noise_rate_hz=5.0)
        frame = jnp.full((16, 16), 128.0)
        state = init_state(frame, jax.random.key(0), cfg)
        total = 0
        for k in range(5):
            state, out = emulate_frame(
                state, frame, jnp.asarray(0.05 * (k + 1)), cfg
            )
            total += int(out["num_events"])
        assert total == 0

    def test_read_aedat2_filters_aps_and_special_words(self, tmp_path):
        from spacecraft_pose_estimation_tpu.events import io as ev_io

        path = tmp_path / "mixed.aedat"
        wr = ev_io.AEDat2Writer(str(path), 346, 260)
        ev = np.array([[0.001, 10, 20, 1], [0.002, 30, 40, -1]], np.float64)
        wr.append(ev)
        wr.close()
        # splice in an APS sample word (bit 31) and a special event
        # (bit 10) between the two real events
        with open(path, "rb") as f:
            raw = f.read()
        off = 0
        while raw[off:off + 1] == b"#":
            off = raw.index(b"\n", off) + 1
        aps = np.array([np.int32(-2147000000), 1500], ">i4").tobytes()
        special = np.array([np.int32(1 << 10), 1600], ">i4").tobytes()
        mixed = raw[:off + 8] + aps + special + raw[off + 8:]
        mixed_path = tmp_path / "mixed2.aedat"
        mixed_path.write_bytes(mixed)
        got = ev_io.read_aedat2(str(mixed_path), 346, 260)
        assert got.shape == (2, 4)
        np.testing.assert_allclose(got[:, 1:], ev[:, 1:])

    def test_read_events_csv_whitespace_autodetect(self, tmp_path):
        from spacecraft_pose_estimation_tpu.events import io as ev_io

        p = tmp_path / "ev.txt"
        p.write_text("# v2e dvs text\n0.001 5 6 1\n0.002 7 8 0\n")
        got = ev_io.read_events_csv(str(p), force_pos_polarity=False)
        assert got.shape == (2, 4)
        np.testing.assert_allclose(got[0], [0.001, 5, 6, 1])
        np.testing.assert_allclose(got[1, 3], -1)  # p=0 -> -1

    def test_accumulate_exposure_frames_matches_naive(self):
        from spacecraft_pose_estimation_tpu.events import io as ev_io

        rng = np.random.default_rng(5)
        n = 5000
        t = np.sort(rng.uniform(0, 0.1, n))
        ev = np.stack([
            t, rng.integers(0, 32, n), rng.integers(0, 24, n),
            rng.choice([-1.0, 1.0], n),
        ], axis=1)
        frames = list(ev_io.accumulate_exposure_frames(ev, 32, 24, 0.01, 3))
        # naive per-frame boolean-mask accumulation (the old loop)
        t0 = ev[0, 0]
        bins = np.floor((ev[:, 0] - t0) / 0.01).astype(np.int64)
        assert len(frames) == int(bins.max()) + 1
        for fidx, (img01, t_end) in enumerate(frames):
            sel = ev[bins == fidx]
            acc = np.zeros((24, 32), np.float64)
            np.add.at(acc, (sel[:, 2].astype(int), sel[:, 1].astype(int)), sel[:, 3])
            want = (np.clip(acc, -3, 3) + 3) / 6.0
            np.testing.assert_allclose(img01, want)
            assert abs(t_end - (t0 + (fidx + 1) * 0.01)) < 1e-12
