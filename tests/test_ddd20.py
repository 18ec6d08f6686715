"""DDD20 HDF5 reader: round-trip against the documented caer packet
format (v2ecore/ddd20_interfaces/caer.py:50-96 bit packing)."""

import numpy as np
import pytest

from spacecraft_pose_estimation_tpu.events import ddd20


def make_events(n, seed=0):
    rng = np.random.default_rng(seed)
    return np.stack(
        [
            np.sort(rng.integers(0, 5_000_000, n)),
            rng.integers(0, ddd20.DVS_SHAPE[1], n),
            rng.integers(0, ddd20.DVS_SHAPE[0], n),
            rng.integers(0, 2, n),
        ],
        axis=1,
    ).astype(np.int64)


class TestDDD20:
    def test_event_roundtrip(self, tmp_path):
        ev = make_events(10000)
        path = str(tmp_path / "rec.hdf5")
        ddd20.write_ddd20(path, ev, packet_size=1024)
        r = ddd20.DDD20Reader(path)
        out = r.events()
        r.close()
        assert out.shape == ev.shape
        np.testing.assert_array_equal(out, ev)

    def test_frames_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        frames = [
            (0.5, rng.integers(0, 1023, ddd20.DVS_SHAPE).astype(np.uint16)),
            (0.6, rng.integers(0, 1023, ddd20.DVS_SHAPE).astype(np.uint16)),
        ]
        path = str(tmp_path / "rec.hdf5")
        ddd20.write_ddd20(path, make_events(100), frames=frames)
        r = ddd20.DDD20Reader(path)
        got = r.frames()
        r.close()
        assert len(got) == 2
        assert got[0][0] == pytest.approx(0.5, abs=1e-6)
        np.testing.assert_array_equal(got[0][1], frames[0][1])
        np.testing.assert_array_equal(got[1][1], frames[1][1])

    def test_bit_packing_matches_reference_decode(self, tmp_path):
        """Decode with the reference's own formulas (caer.py:57-63) as
        the oracle for one packet."""
        ev = make_events(257, seed=4)
        path = str(tmp_path / "rec.hdf5")
        ddd20.write_ddd20(path, ev, packet_size=10_000, rotate180=True)
        import h5py, struct

        with h5py.File(path) as f:
            row = f["dvs"]["data"][0]
            hdr = ddd20.unpack_header(bytes(row[1])[:28])
            arr = np.frombuffer(bytes(row[2]), np.uint32).reshape(
                hdr["ecapacity"], hdr["esize"] // 4
            )
        data, ts = arr[:, 0], arr[:, 1]
        pol = data >> 1 & 0b1
        y = data >> 2 & 0b111111111111111
        x = data >> 17
        # reference reader applies rotate180 on read
        x = ddd20.DVS_SHAPE[1] - x - 1
        y = ddd20.DVS_SHAPE[0] - y - 1
        np.testing.assert_array_equal(x, ev[:, 1])
        np.testing.assert_array_equal(y, ev[:, 2])
        np.testing.assert_array_equal(pol, ev[:, 3])
        np.testing.assert_array_equal(ts, ev[:, 0])

    def test_rejects_non_davis_file(self, tmp_path):
        import h5py

        p = str(tmp_path / "bad.hdf5")
        with h5py.File(p, "w") as f:
            f.create_group("other")
        with pytest.raises(ValueError):
            ddd20.DDD20Reader(p)
