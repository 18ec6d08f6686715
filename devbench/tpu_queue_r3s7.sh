#!/bin/bash
# Round-3 session-7 hardware queue — serialized (one process per chip).
# det512 every-frame at b64: the s6 det512 run used b32 (184.4 fps); the
# batch knob dominates (768: b32=151.8 -> b64=247.7), so 512 b64 should
# beat the published 247.7 every-frame point.
set -u -o pipefail
cd "$(dirname "$0")/.."
mkdir -p devbench/logs
echo "=== [det512_b64] $(date -u +%H:%M:%S) ==="
BENCH_DET_SIZE=512 timeout 4800 python - <<'PYEOF' 2>&1 | tee devbench/logs/r3s7_det512_b64.log
import bench
print("det512 every-frame b64 fps:",
      round(bench.measure_full_path(det_batch=64, det_every=1), 2), flush=True)
PYEOF
echo "=== [done] $(date -u +%H:%M:%S) ==="
