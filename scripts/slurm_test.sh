#!/usr/bin/env bash
# SLURM eval launcher (tools/slurm_test.sh analog); see
# scripts/slurm_train.sh for the env/coordinator model.
#
# Usage: scripts/slurm_test.sh PARTITION JOB_NAME CONFIG [args...]
set -euo pipefail
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
shift 3
NTASKS=${NTASKS:-8}
PORT=${PORT:-12358}
REPO=$(cd "$(dirname "$0")/.." && pwd)

srun -p "$PARTITION" --job-name="$JOB_NAME" --ntasks="$NTASKS" \
  --ntasks-per-node="${NTASKS_PER_NODE:-1}" --kill-on-bad-exit=1 \
  bash -c "GLSDET_COORDINATOR=\$(scontrol show hostnames \
      \$SLURM_STEP_NODELIST | head -n1):$PORT \
    python '$REPO/tools/test.py' '$CONFIG' $*"
