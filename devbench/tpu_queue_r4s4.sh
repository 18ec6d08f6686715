#!/bin/bash
# Round-4 session-4 hardware queue — serialized (one process per chip).
# Run AFTER the r4 accuracy run releases the chip. Decision data for
# the primary-headroom attack (VERDICT r3 #4) and the detector
# train-step pass (#8):
#   1. crop segment A/B  (full-frame vs XLA windowed 768/1024)
#   2. merge_fuse model-level A/B (the r7 standard of proof)
#   3. fuse-merge micro shapes (context for #2)
#   4. train-step decomposition (fwd / bb_frozen / full + temp memory)
set -u -o pipefail
cd "$(dirname "$0")/.."
mkdir -p devbench/logs
for job in "probe_r10_crop.py 128" "probe_r12_mergefuse_model.py 128" \
           "probe_r11_fusemerge.py 128" "probe_r13_normfold.py 128" \
           "probe_r9_trainstep.py 16 800"; do
  name=$(echo "$job" | cut -d' ' -f1 | sed 's/probe_//;s/\.py//')
  echo "=== [$name] $(date -u +%H:%M:%S) ==="
  timeout 3000 python devbench/$job 2>&1 | tee "devbench/logs/r4s4_${name}.log"
  echo "=== [$name] rc=$? $(date -u +%H:%M:%S) ==="
done
