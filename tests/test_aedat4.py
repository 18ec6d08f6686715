"""Native AEDAT-4 decode path: C++ LZ4 codec, flatbuffer container
round-trips, and the aedat_to_csv / convert_aedats CLIs executed on real
(synthesized) .aedat4 files.

The writer encodes with the official `flatbuffers` Builder while the
reader is a hand-rolled parser of the documented format, so round-trip
agreement validates the parser against an independent serializer.
Reference contract: v2e/aedat_to_csv.py:16-45, v2e/convert_aedats.py.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "SPE_PLATFORM": "cpu", "JAX_PLATFORMS": "cpu"}

from spacecraft_pose_estimation_tpu.events import aedat4 as a4


def run(cmd):
    r = subprocess.run(
        [sys.executable] + cmd, cwd=REPO, env=ENV, capture_output=True, text=True
    )
    if r.returncode != 0:
        raise AssertionError(
            f"cmd failed: {cmd}\nstdout:{r.stdout[-3000:]}\nstderr:{r.stderr[-3000:]}"
        )
    return r


def random_events(n, seed=0, t_max=2.0):
    rng = np.random.default_rng(seed)
    return np.stack(
        [
            np.sort(rng.uniform(0.0, t_max, n)),
            rng.integers(0, 346, n),
            rng.integers(0, 260, n),
            rng.integers(0, 2, n) * 2 - 1,
        ],
        axis=1,
    )


class TestLZ4Codec:
    @pytest.mark.parametrize(
        "data",
        [
            b"",
            b"x",
            b"hello world " * 1000,  # highly compressible (long matches)
            bytes(range(256)) * 64,  # periodic
            b"a" * 100000,  # extreme RLE: overlapping match copies
        ],
        ids=["empty", "one", "text", "periodic", "rle"],
    )
    def test_roundtrip(self, data):
        comp = a4.lz4_frame_compress(data)
        assert a4.lz4_frame_decompress(comp) == data

    def test_incompressible_roundtrip(self):
        data = np.random.default_rng(1).integers(0, 256, 65536, np.uint8).tobytes()
        comp = a4.lz4_frame_compress(data)
        assert a4.lz4_frame_decompress(comp) == data
        # stored path: at most a few bytes of framing overhead
        assert len(comp) < len(data) + 32

    def test_compresses_structured_event_data(self):
        ev = random_events(20000)
        raw = a4._build_event_packet(
            np.stack(
                [np.round(ev[:, 0] * 1e6), ev[:, 1], ev[:, 2], (ev[:, 3] > 0)], axis=1
            ).astype(np.int64)
        )
        comp = a4.lz4_frame_compress(raw)
        assert len(comp) < len(raw)
        assert a4.lz4_frame_decompress(comp) == raw

    def test_malformed_frame_raises(self):
        with pytest.raises(ValueError):
            a4.lz4_frame_decompress(b"\x00\x01\x02\x03not a frame", max_out=1024)


class TestAedat4RoundTrip:
    @pytest.mark.parametrize(
        "comp",
        [a4.COMPRESSION_NONE, a4.COMPRESSION_LZ4, a4.COMPRESSION_ZSTD],
        ids=["none", "lz4", "zstd"],
    )
    def test_roundtrip(self, comp, tmp_path):
        ev = random_events(12345, seed=comp)
        path = str(tmp_path / "rec.aedat4")
        a4.write_aedat4(path, ev, compression=comp, packet_size=1000)
        out = a4.read_aedat4(path)
        assert out.shape == (12345, 4)
        np.testing.assert_array_equal(out[:, 0], np.round(ev[:, 0] * 1e6))
        np.testing.assert_array_equal(out[:, 1], ev[:, 1].astype(np.int64))
        np.testing.assert_array_equal(out[:, 2], ev[:, 2].astype(np.int64))
        np.testing.assert_array_equal(out[:, 3], (ev[:, 3] > 0).astype(np.int64))

    def test_header_info_node_and_empty_file(self, tmp_path):
        path = str(tmp_path / "empty.aedat4")
        a4.write_aedat4(path, np.zeros((0, 4)))
        assert a4.read_aedat4(path).shape[1] == 4
        with open(path, "rb") as f:
            data = f.read()
        assert data.startswith(b"#!AER-DAT4.0\r\n")
        _, _, info, _ = a4.parse_ioheader(data[14:])
        assert "sizeX" in info

    def test_rejects_non_aedat4(self, tmp_path):
        p = tmp_path / "bad.aedat4"
        p.write_bytes(b"#!AER-DAT2.0\r\njunk")
        with pytest.raises(ValueError):
            a4.read_aedat4(str(p))


class TestCLIsExecuted:
    def test_aedat_to_csv_contract(self, tmp_path):
        """CSV contract of the reference converter: header-less t,x,y,p
        rows, t in us offset from the first event, polarity 0/1."""
        ev = random_events(500, seed=3)
        ev[:, 0] += 5.0  # non-zero first timestamp to exercise the offset
        rec = str(tmp_path / "rec.aedat4")
        out_csv = str(tmp_path / "events.csv")
        a4.write_aedat4(rec, ev, compression=a4.COMPRESSION_LZ4)
        run(["tools/aedat_to_csv.py", "--events_file", rec, "--output_file", out_csv])

        rows = np.loadtxt(out_csv, delimiter=",")
        assert rows.shape == (500, 4)
        assert rows[0, 0] == 0  # offset from first event
        t_us = np.round(ev[:, 0] * 1e6)
        np.testing.assert_array_equal(rows[:, 0], t_us - t_us[0])
        assert set(np.unique(rows[:, 3])) <= {0.0, 1.0}

    def test_convert_aedats_executes_on_aedat4(self, tmp_path):
        recdir = tmp_path / "recs"
        recdir.mkdir()
        ev = random_events(3000, seed=4, t_max=0.05)
        a4.write_aedat4(
            str(recdir / "scene1.aedat4"), ev, compression=a4.COMPRESSION_ZSTD
        )
        calib = tmp_path / "calibration.json"
        calib.write_text(
            json.dumps(
                {
                    "intrinsics": {
                        "camera_matrix": [[300.0, 0, 173.0], [0, 300.0, 130.0], [0, 0, 1.0]],
                        "distortion_coefficients": [0.05, 0, 0, 0, 0],
                    }
                }
            )
        )
        out = tmp_path / "out"
        run([
            "tools/convert_aedats.py",
            "--recordings-dir", str(recdir),
            "--output-dir", str(out),
            "--calibration-file", str(calib),
            "--width", "346", "--height", "260",
            "--exposure", "0.01",
        ])
        scene = out / "scene1"
        assert (scene / "events.csv").exists()
        frames = sorted(scene.glob("*.bmp"))
        assert len(frames) >= 4  # 0.05 s at 10 ms exposure
        import cv2

        img = cv2.imread(str(frames[0]))
        assert img.shape == (260, 346, 3)


class TestLz4LinkedFrames:
    """Block-LINKED frames (the default mode of standard lz4 encoders):
    match offsets may reach into previously decompressed blocks."""

    @staticmethod
    def _linked_frame() -> bytes:
        import struct

        # FLG 0x40: version 01, block-independence OFF; BD 0x40: 64KB
        hdr = struct.pack("<I", 0x184D2204) + b"\x40\x40\x00"
        blk1 = struct.pack("<I", 8 | 0x80000000) + b"abcdefgh"  # stored
        # compressed block: 0 literals, match offset 8 len 8 -> replays
        # the PREVIOUS block's bytes (offset exceeds this block's output)
        blk2_body = b"\x04\x08\x00"
        blk2 = struct.pack("<I", len(blk2_body)) + blk2_body
        return hdr + blk1 + blk2 + struct.pack("<I", 0)

    def test_linked_match_across_blocks(self):
        from spacecraft_pose_estimation_tpu.events import aedat4 as a4

        assert a4.lz4_frame_decompress(self._linked_frame()) == b"abcdefgh" * 2

    def test_malformed_rejected_without_growth(self):
        """Malformed input must raise immediately (C ABI -2), not grow
        the retry buffer toward 2 GiB."""
        import struct

        from spacecraft_pose_estimation_tpu.events import aedat4 as a4

        hdr = struct.pack("<I", 0x184D2204) + b"\x60\x40\x00"
        bad_body = b"\x04\x00\x00"  # match offset 0: invalid
        frame = hdr + struct.pack("<I", len(bad_body)) + bad_body + struct.pack("<I", 0)
        with pytest.raises(ValueError, match="malformed"):
            a4.lz4_frame_decompress(frame)

    def test_multi_block_large_input_roundtrip(self):
        """>4MiB inputs must be split into multiple blocks (the declared
        BD max block size) and still round-trip."""
        import struct

        from spacecraft_pose_estimation_tpu.events import aedat4 as a4

        data = (b"0123456789abcdef" * 17) * 20000  # ~5.2 MiB compressible
        assert len(data) > (4 << 20)
        comp = a4.lz4_frame_compress(data)
        # parse the block headers: must be >= 2 data blocks
        pos, nblocks = 7, 0
        while True:
            (raw,) = struct.unpack_from("<I", comp, pos)
            if raw == 0:
                break
            nblocks += 1
            pos += 4 + (raw & 0x7FFFFFFF)
        assert nblocks >= 2
        assert a4.lz4_frame_decompress(comp) == data
