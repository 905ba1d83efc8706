#!/usr/bin/env bash
# Multi-host TPU training launcher — the jax.distributed equivalent of the
# reference's NCCL launchers (tools/scripts/dist_train.sh, torch_train.sh,
# slurm_train.sh). One process per TPU host; on Cloud TPU pods run this on
# every worker (e.g. via `gcloud compute tpus tpu-vm ssh --worker=all`).
#
# Env (auto-detected on Cloud TPU; override for manual/CPU-process runs):
#   COORDINATOR_ADDRESS  host:port of process 0   (default: auto)
#   NUM_PROCESSES        total host processes     (default: auto)
#   PROCESS_ID           this host's index        (default: auto)
#
# Usage: tools/scripts/tpu_train.sh <cfg_file> [extra train.py args...]
set -euo pipefail

CFG=${1:?usage: tpu_train.sh <cfg_file> [args...]}
shift

DIST_ARGS=()
if [[ -n "${COORDINATOR_ADDRESS:-}" ]]; then
    DIST_ARGS+=(--coordinator_address "$COORDINATOR_ADDRESS"
                --num_processes "${NUM_PROCESSES:?set NUM_PROCESSES}"
                --process_id "${PROCESS_ID:?set PROCESS_ID}")
fi

exec python "$(dirname "$0")/../train.py" --cfg_file "$CFG" \
    "${DIST_ARGS[@]}" "$@"
