#!/usr/bin/env python
"""AEDAT-4 recording -> events CSV (v2e/aedat_to_csv.py equivalent).

Output contract matches the reference: header-less rows ``t,x,y,p``
with t in microseconds offset from the FIRST event, polarity 0/1,
written in chunks so arbitrarily large recordings stream through
bounded memory (aedat_to_csv.py:23-45).

Decoding is fully native (events/aedat4.py + native/lz4.cpp) — no
`aedat` package needed.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description="Convert an aedat4 file to csv.")
    ap.add_argument("--events_file", required=True, help="aedat4 format file")
    ap.add_argument("--output_file", required=True, help="path for csv output")
    ap.add_argument("--chunk", type=int, default=2_000_000, help="rows per write")
    args = ap.parse_args()

    import numpy as np

    from spacecraft_pose_estimation_tpu.events.aedat4 import read_aedat4

    ev = read_aedat4(args.events_file)  # (N, 4) int64 [t_us, x, y, p]
    if len(ev):
        ev[:, 0] -= ev[0, 0]  # offset from first event (reference :27-28)

    with open(args.output_file, "w") as f:
        for start in range(0, max(len(ev), 1), args.chunk):
            chunk = ev[start : start + args.chunk]
            if len(chunk) == 0:
                break
            np.savetxt(f, chunk, fmt="%d", delimiter=",")
    print(f"wrote {args.output_file} ({len(ev)} events)")


if __name__ == "__main__":
    main()
