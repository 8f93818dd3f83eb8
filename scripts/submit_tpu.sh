#!/usr/bin/env bash
# TPU job launcher — the reference's scripts/submit_slurm.sh (8-GPU torchrun)
# equivalent. Single-host TPU slices need no launcher (one process drives all
# local chips through the mesh); multi-host slices run one process per host
# with jax.distributed coordination.
#
# Usage:
#   scripts/submit_tpu.sh -- +train=dicow_v3 ...                # single process
#   scripts/submit_tpu.sh --hosts h1,h2,... -- +train=... ...   # one proc/host
#   scripts/submit_tpu.sh --local-procs N -- +train=... ...     # N local procs
#
# --local-procs spawns N coordinated processes on THIS host (the torchrun
# --standalone --nproc-per-node analogue); it is also what the CI
# multi-process smoke drives, with PYTHON pointing at a stub that checks
# the JAX_* coordination env. PYTHON overrides the interpreter (default:
# python).
set -euo pipefail

HOSTS=""
LOCAL_PROCS=0
while [[ $# -gt 0 ]]; do
  case "$1" in
    --hosts) HOSTS="$2"; shift 2 ;;
    --local-procs) LOCAL_PROCS="$2"; shift 2 ;;
    --) shift; break ;;
    *) break ;;
  esac
done

PY="${PYTHON:-python}"

if [[ "$LOCAL_PROCS" -gt 1 ]]; then
  PORT="${JAX_COORDINATOR_PORT:-8476}"
  PIDS=()
  for ((i = 0; i < LOCAL_PROCS; i++)); do
    JAX_COORDINATOR_ADDRESS="localhost:$PORT" \
      JAX_NUM_PROCESSES="$LOCAL_PROCS" \
      JAX_PROCESS_ID="$i" "$PY" main.py "$@" &
    PIDS+=($!)
  done
  STATUS=0
  for pid in "${PIDS[@]}"; do
    wait "$pid" || STATUS=$?
  done
  exit "$STATUS"
fi

if [[ -z "$HOSTS" ]]; then
  exec "$PY" main.py "$@"
fi

IFS=',' read -ra HOST_ARR <<< "$HOSTS"
NUM=${#HOST_ARR[@]}
COORD="${HOST_ARR[0]}:${JAX_COORDINATOR_PORT:-8476}"
PIDS=()
for i in "${!HOST_ARR[@]}"; do
  ssh "${HOST_ARR[$i]}" \
    "cd $(pwd) && JAX_COORDINATOR_ADDRESS=$COORD JAX_NUM_PROCESSES=$NUM \
     JAX_PROCESS_ID=$i ${PYTHON:-python} main.py $*" &
  PIDS+=($!)
done
STATUS=0
for pid in "${PIDS[@]}"; do
  wait "$pid" || STATUS=$?
done
exit "$STATUS"
