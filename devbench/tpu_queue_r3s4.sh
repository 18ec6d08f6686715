#!/bin/bash
# Round-3 session-4 follow-up TPU queue — run AFTER bench.py finishes
# (only one process may touch the chip).
# Usage: bash devbench/tpu_queue_r3s4.sh [stage]
# Stages: traindet det512
set -u
cd "$(dirname "$0")/.."
STAGE="${1:-all}"

run_stage() {
  echo "=== [$1] $(date -u +%H:%M:%S) ==="
}

if [ "$STAGE" = all ] || [ "$STAGE" = traindet ]; then
  # X101-FPN train-step s/iter on one v5e vs the zoo's 0.638 s/iter
  # at batch 16 on 8x V100 (MODEL_ZOO.md:192-199). b16 at 800^2 may
  # not fit one chip; b8 with the linear scale noted is the honest
  # single-chip point — run b8 first, then try b16.
  run_stage traindet_b8
  timeout 3000 python tools/benchmark.py --task train-det \
    --model config_1 --input-size 800 --batch-size 8
  run_stage traindet_b16
  timeout 3000 python tools/benchmark.py --task train-det \
    --model config_1 --input-size 800 --batch-size 16
fi

if [ "$STAGE" = all ] || [ "$STAGE" = b160 ]; then
  # opportunistic: primary batch sweep around 128 (bf16 b192 regressed
  # in round 1; int8 scheduling may differ). Uses the one-JSON bench
  # path with the full-path extras skipped.
  run_stage b160
  BENCH_SKIP_FULL_PATH=1 BENCH_BATCH=160 timeout 2400 python bench.py
fi

if [ "$STAGE" = all ] || [ "$STAGE" = det512 ]; then
  # extra labeled serving point: 512-letterbox detector (different
  # workload from the 768 parity geometry — label any published number)
  run_stage det512
  BENCH_DET_SIZE=512 timeout 4200 python - <<'EOF'
import bench
print("det512 every-frame fps:",
      round(bench.measure_full_path(det_batch=32, det_every=1), 2), flush=True)
print("det512 tracked fps:",
      round(bench.measure_full_path(det_batch=8, det_every=16), 2), flush=True)
EOF
fi
