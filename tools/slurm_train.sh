#!/usr/bin/env bash
# Slurm launcher (reference tools/slurm_train.sh role): one task per host;
# jax.distributed.initialize() picks coordinates from the Slurm env.
#
#   GPUS_PER_NODE is meaningless on TPU pods — request whole hosts:
#   sbatch -p $PARTITION -N $NODES --ntasks-per-node=1 \
#       tools/slurm_train.sh $PARTITION $JOB_NAME $CONFIG [args...]

set -euo pipefail
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
shift 3

srun -p "$PARTITION" \
    --job-name="$JOB_NAME" \
    --ntasks-per-node=1 \
    --kill-on-bad-exit=1 \
    python "$(dirname "$0")/train.py" "$CONFIG" --distributed "$@"
