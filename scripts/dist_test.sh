#!/usr/bin/env bash
# Multi-process eval launcher (tools/dist_test.sh analog); see
# scripts/dist_train.sh for the process/mesh model.
#
# Usage: scripts/dist_test.sh CONFIG NPROC [test.py args...]
set -euo pipefail
CONFIG=$1
NPROC=$2
shift 2
PORT=${PORT:-12356}
REPO=$(cd "$(dirname "$0")/.." && pwd)

export JAX_PLATFORMS=${JAX_PLATFORMS:-cpu}
if [[ "$JAX_PLATFORMS" == "cpu" && \
      "${XLA_FLAGS:-}" != *xla_force_host_platform_device_count* ]]; then
  export XLA_FLAGS="${XLA_FLAGS:-} --xla_force_host_platform_device_count=1"
fi
export GLSDET_COORDINATOR=127.0.0.1:$PORT
export GLSDET_NUM_PROCESSES=$NPROC

pids=()
for ((i = 0; i < NPROC; i++)); do
  GLSDET_PROCESS_ID=$i python "$REPO/tools/test.py" "$CONFIG" "$@" &
  pids+=($!)
done
rc=0
for pid in "${pids[@]}"; do
  wait "$pid" || rc=$?
done
exit $rc
