#!/bin/bash
# Round-4 session-4 hardware queue — serialized (one process per chip).
# Run AFTER the r4 accuracy run releases the chip. Decision data for
# the primary-headroom attack (VERDICT r3 #4) and the detector
# train-step pass (#8), decision probes first:
#   1. merge_fuse model-level A/B   (flips BENCH_MERGE_FUSE default)
#   2. fold_normalize model-level A/B (flips BENCH_NORMFOLD default)
#   3. crop segment A/B             (full-frame vs XLA windowed 768/1024)
#   4. train-step decomposition     (fwd / bb_frozen / full + temp memory)
#   5. micro context: fuse-merge shapes, normfold segment
set -u -o pipefail
cd "$(dirname "$0")/.."
mkdir -p devbench/logs
for job in "probe_r12_mergefuse_model.py 128" "probe_r14_normfold_model.py 128" \
           "probe_r10_crop.py 128" "probe_r9_trainstep.py 16 800" \
           "probe_r11_fusemerge.py 128" "probe_r13_normfold.py 128"; do
  name=$(echo "$job" | cut -d' ' -f1 | sed 's/probe_//;s/\.py//')
  echo "=== [$name] $(date -u +%H:%M:%S) ==="
  timeout 3000 python devbench/$job 2>&1 | tee "devbench/logs/r4s4_${name}.log"
  echo "=== [$name] rc=$? $(date -u +%H:%M:%S) ==="
done
