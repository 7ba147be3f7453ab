#!/usr/bin/env bash
# Multi-process training launcher (tools/dist_train.sh analog).
#
# Reference behavior: yolox-ufp/tools/dist_train.sh wraps
# torch.distributed.launch --nproc_per_node=$GPUS tools/train.py.
# Here each process is one jax host; jax.distributed wires their
# devices into one global mesh (glsdet_tpu/parallel/mesh.py:
# init_distributed).  On a real TPU pod run ONE process per host with
# GLSDET_COORDINATOR/GLSDET_NUM_PROCESSES/GLSDET_PROCESS_ID set; this
# script spawns all N locally (CPU backend) for single-machine use and
# CI — the virtual-DCN path exercised by scripts/multihost_smoke.py.
#
# Usage: scripts/dist_train.sh CONFIG NPROC [train.py args...]
set -euo pipefail
CONFIG=$1
NPROC=$2
shift 2
PORT=${PORT:-12355}
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
  GLSDET_PROCESS_ID=$i python "$REPO/tools/train.py" "$CONFIG" "$@" &
  pids+=($!)
done
rc=0
for pid in "${pids[@]}"; do
  wait "$pid" || rc=$?
done
exit $rc
