#!/usr/bin/env bash
# TPU job launcher — the reference's scripts/submit_slurm.sh (8-GPU torchrun)
# equivalent. Single-host TPU slices need no launcher (one process drives all
# local chips through the mesh); multi-host slices run one process per host
# with jax.distributed coordination.
#
# Usage: scripts/submit_tpu.sh [--hosts host1,host2,...] -- +train=dicow_v3 ...
set -euo pipefail

HOSTS=""
while [[ $# -gt 0 ]]; do
  case "$1" in
    --hosts) HOSTS="$2"; shift 2 ;;
    --) shift; break ;;
    *) break ;;
  esac
done

if [[ -z "$HOSTS" ]]; then
  exec python main.py "$@"
fi

IFS=',' read -ra HOST_ARR <<< "$HOSTS"
NUM=${#HOST_ARR[@]}
COORD="${HOST_ARR[0]}:8476"
for i in "${!HOST_ARR[@]}"; do
  ssh "${HOST_ARR[$i]}" \
    "cd $(pwd) && JAX_COORDINATOR_ADDRESS=$COORD JAX_NUM_PROCESSES=$NUM \
     JAX_PROCESS_ID=$i python main.py $*" &
done
wait
