#!/usr/bin/env bash
# Pretraining launcher (parity: reference scripts/train.sh, minus torchrun —
# SPMD replaces per-GPU processes; all local TPU devices are used).
set -euo pipefail
cd "$(dirname "$0")/.."

RUN_NAME="${RUN_NAME:-train_run}"
CONFIG="${CONFIG:-cfg/train_cityscapes.yaml}"

python scripts/train.py \
    --run_name "${RUN_NAME}" \
    --filename_config "${CONFIG}" \
    "$@"
