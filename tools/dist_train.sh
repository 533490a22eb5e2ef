#!/usr/bin/env bash
# Multi-host SPMD training launch (analog of the reference dist_train.sh).
#
# There is no torch.distributed.launch equivalent: run ONE process per host
# and jax.distributed discovers the fleet from the coordinator address.
#
# Usage on each host:
#   NNODES=2 NODE_RANK=0 MASTER_ADDR=host0 MASTER_PORT=1234 \
#     bash tools/dist_train.sh --cfg_file configs/waymo_one_sweep.yaml \
#     --data_dir /data/waymo --save_dir runs/exp1 [train.py args...]
set -euo pipefail

NNODES=${NNODES:-1}
NODE_RANK=${NODE_RANK:-0}
MASTER_ADDR=${MASTER_ADDR:-127.0.0.1}
MASTER_PORT=${MASTER_PORT:-8476}

# These are the env names jax.distributed.initialize() actually reads.
export JAX_NUM_PROCESSES=$NNODES
export JAX_COORDINATOR_ADDRESS="$MASTER_ADDR:$MASTER_PORT"
export JAX_PROCESS_ID=$NODE_RANK

exec python "$(dirname "$0")/train.py" --launcher jax "$@"
