#!/usr/bin/env bash
# Evaluation launcher (reference tools/dist_test.sh surface).
#
# WIDER val evaluation is single-host in this framework: one process
# drives all local chips and the 3226-image pass takes ~1-2 minutes, so
# there is no multi-process result-collection stage to coordinate (the
# reference needed collect_results_gpu/cpu across DDP ranks,
# apis/test.py:136-209). This wrapper exists for CLI parity.
#
#   tools/dist_test.sh yunet_n ckpt [--mode 2 ...]

set -euo pipefail
CONFIG=$1
CHECKPOINT=$2
shift 2

exec python "$(dirname "$0")/test_widerface.py" "$CONFIG" "$CHECKPOINT" "$@"
