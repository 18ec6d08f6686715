"""Round-3 batching A/B:
  1. full-path detect-EVERY-frame at det_batch 32/64 (the b8 point runs
     HRNet at batch 8 where it is latency-bound — DEVNOTES: 3.2 ms/frame
     at b32 vs 0.9 at b128 bf16),
  2. primary int8 pipeline at batch 256 (int8 halves activation HBM, so
     the b192 bf16 regression may not bind).
Run one case per process (remote-compile service pays full compile per
process): python devbench/exp_r3_batching.py {fp32|fp64|p256}
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench


def main():
    which = sys.argv[1]
    if which == "fp32":
        fps = bench.measure_full_path(det_batch=32, det_every=1)
        print(f"full_path det_every=1 det_batch=32: {fps:.1f} fps", flush=True)
    elif which == "fp64":
        fps = bench.measure_full_path(det_batch=64, det_every=1)
        print(f"full_path det_every=1 det_batch=64: {fps:.1f} fps", flush=True)
    elif which == "p256":
        fps = bench.measure(256, "int8", 2, 6)
        print(f"primary int8 b256: {fps:.1f} fps", flush=True)
    elif which == "p128":
        fps = bench.measure(128, "int8", 2, 12)
        print(f"primary int8 b128: {fps:.1f} fps", flush=True)
    else:
        raise SystemExit(f"unknown case {which}")


if __name__ == "__main__":
    main()
