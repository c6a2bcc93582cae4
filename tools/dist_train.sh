#!/usr/bin/env bash
# Multi-host SPMD training launcher (reference tools/dist_train.sh role).
#
# The reference spawns one process per GPU via torch.distributed.launch;
# with JAX SPMD a single process drives every local chip, so "distributed"
# means one process per HOST. Set the coordinator and run this script on
# each host:
#
#   COORDINATOR=host0:8476 NUM_PROCESSES=4 PROCESS_ID=$i \
#       tools/dist_train.sh yunet_n --work-dir work_dirs/yunet_n
#
# Single host, all local chips: just `python tools/train.py yunet_n`.

set -euo pipefail
CONFIG=$1
shift

export JAX_COORDINATOR_ADDRESS=${COORDINATOR:-localhost:8476}
export JAX_NUM_PROCESSES=${NUM_PROCESSES:-1}
export JAX_PROCESS_ID=${PROCESS_ID:-0}

exec python "$(dirname "$0")/train.py" "$CONFIG" --distributed "$@"
