#!/usr/bin/env bash
# Slurm evaluation launcher (reference tools/slurm_test.sh role).
#
# WIDER val evaluation is single-host here (one process drives all local
# chips; no cross-rank result collection needed), so this requests ONE
# task and runs the standard evaluator under srun:
#
#   sbatch -p $PARTITION tools/slurm_test.sh $PARTITION $JOB_NAME \
#       $CONFIG $CHECKPOINT [--mode 2 ...]

set -euo pipefail
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
CHECKPOINT=$4
shift 4

srun -p "$PARTITION" \
    --job-name="$JOB_NAME" \
    --ntasks=1 \
    --kill-on-bad-exit=1 \
    python "$(dirname "$0")/test_widerface.py" "$CONFIG" "$CHECKPOINT" "$@"
