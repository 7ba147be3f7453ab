#!/usr/bin/env bash
# SLURM training launcher (tools/slurm_train.sh analog).
#
# Reference behavior: yolox-ufp/tools/slurm_train.sh wraps
# `srun ... python tools/train.py --launcher slurm`.  Here train.py
# reads SLURM_NTASKS/SLURM_PROCID directly (parallel/mesh.py:
# maybe_init_distributed); the coordinator is task 0's node.
#
# Usage: scripts/slurm_train.sh PARTITION JOB_NAME CONFIG [args...]
set -euo pipefail
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
shift 3
NTASKS=${NTASKS:-8}
PORT=${PORT:-12357}
REPO=$(cd "$(dirname "$0")/.." && pwd)

srun -p "$PARTITION" --job-name="$JOB_NAME" --ntasks="$NTASKS" \
  --ntasks-per-node="${NTASKS_PER_NODE:-1}" --kill-on-bad-exit=1 \
  bash -c "GLSDET_COORDINATOR=\$(scontrol show hostnames \
      \$SLURM_STEP_NODELIST | head -n1):$PORT \
    python '$REPO/tools/train.py' '$CONFIG' $*"
