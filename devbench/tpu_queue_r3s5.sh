#!/bin/bash
# Round-3 session-5 hardware queue — serialized (one process per chip).
# Stage 1 is the decision-critical one: the published full-path numbers
# (273.9/151.8/1050.1 fps) predate the in-loop letterbox fix; re-measure
# and update README/PARITY/DEVNOTES with the honest values.
# Usage: bash devbench/tpu_queue_r3s5.sh [stage]   (stages: bench traindet b160 det512)
set -u
cd "$(dirname "$0")/.."
mkdir -p devbench/logs
STAGE="${1:-all}"

stamp() { echo "=== [$1] $(date -u +%H:%M:%S) ==="; }

if [ "$STAGE" = all ] || [ "$STAGE" = bench ]; then
  stamp bench_remeasure
  BENCH_BUDGET_S=9000 BENCH_FP_BATCH=64 timeout 11000 python bench.py \
    2> devbench/logs/r3s5_bench.err | tee devbench/logs/r3s5_bench.json
fi

if [ "$STAGE" = all ] || [ "$STAGE" = traindet ]; then
  stamp traindet_b8
  timeout 3600 python tools/benchmark.py --task train-det \
    --model config_1 --input-size 800 --batch-size 8 \
    2>&1 | tee devbench/logs/r3s5_traindet_b8.log
  stamp traindet_b16
  timeout 3600 python tools/benchmark.py --task train-det \
    --model config_1 --input-size 800 --batch-size 16 \
    2>&1 | tee devbench/logs/r3s5_traindet_b16.log
fi

if [ "$STAGE" = all ] || [ "$STAGE" = b160 ]; then
  stamp b160
  BENCH_SKIP_FULL_PATH=1 BENCH_BATCH=160 timeout 2700 python bench.py \
    2> devbench/logs/r3s5_b160.err | tee devbench/logs/r3s5_b160.json
fi

if [ "$STAGE" = all ] || [ "$STAGE" = det512 ]; then
  stamp det512
  BENCH_DET_SIZE=512 timeout 4800 python - <<'EOF' 2>&1 | tee devbench/logs/r3s5_det512.log
import bench
print("det512 every-frame fps:",
      round(bench.measure_full_path(det_batch=32, det_every=1), 2), flush=True)
print("det512 tracked fps:",
      round(bench.measure_full_path(det_batch=8, det_every=16), 2), flush=True)
EOF
fi

stamp done
