#!/usr/bin/env bash
# TPU-pod launcher: one process per host (reference parity: sensecore/
# run_cmd.sh launches one process per GPU with MASTER_ADDR/WORLD_SIZE; on TPU
# pods jax.distributed discovers topology from the TPU metadata, so the
# launcher is just "run the same command on every host").
#
# Single host (or inside `gcloud compute tpus tpu-vm ssh --worker=all`):
#   bash scripts/launch_tpu_pod.sh yamls SD-2-base-256 [overrides...]
#
# Multi-host via gcloud:
#   gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all \
#     --command="cd $REPO && bash scripts/launch_tpu_pod.sh yamls SD-2-base-256 batch_size=2048"
set -euo pipefail

CONFIG_PATH=${1:?usage: launch_tpu_pod.sh <config-path> <config-name> [overrides...]}
CONFIG_NAME=${2:?missing config name}
shift 2

LOG_DIR=${LOG_DIR:-logs}
mkdir -p "$LOG_DIR"
HOST_ID=$(hostname)

# per-host stdout/stderr files (reference run_cmd.sh:30-33 per-rank logs)
exec python run.py --config-path "$CONFIG_PATH" --config-name "$CONFIG_NAME" "$@" \
  > >(tee "$LOG_DIR/train_${HOST_ID}.out") \
  2> >(tee "$LOG_DIR/train_${HOST_ID}.err" >&2)
