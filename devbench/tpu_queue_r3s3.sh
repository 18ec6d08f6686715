#!/bin/bash
# Round-3 session-3 TPU work queue — run serially when the tunnel recovers.
# Usage: bash devbench/tpu_queue_r3s3.sh [stage]
# Stages: health entry probe bench
set -u
cd "$(dirname "$0")/.."
STAGE="${1:-all}"

run_stage() {
  echo "=== [$1] $(date -u +%H:%M:%S) ==="
}

if [ "$STAGE" = all ] || [ "$STAGE" = health ]; then
  run_stage health
  timeout 180 python -c "
import jax, jax.numpy as jnp
print('devices', jax.devices())
print('matmul', float(jnp.sum(jnp.ones((256,256))@jnp.ones((256,256)))))" || exit 1
fi

if [ "$STAGE" = all ] || [ "$STAGE" = entry ]; then
  run_stage entry
  timeout 900 python -c "
import __graft_entry__, jax
fn, args = __graft_entry__.entry()
jax.jit(fn).lower(*args)
print('entry lower OK')" || exit 1
fi

if [ "$STAGE" = all ] || [ "$STAGE" = probe ]; then
  run_stage probe_r7_epilogue
  timeout 1800 python devbench/probe_r7_epilogue.py || exit 1
fi

if [ "$STAGE" = all ] || [ "$STAGE" = bench ]; then
  run_stage bench
  # re-measure after the in-loop letterbox fix (the published full-path
  # numbers were taken with the resize hoisted out of the scan)
  timeout 5400 python bench.py || exit 1
fi
