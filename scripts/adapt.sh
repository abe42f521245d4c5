#!/usr/bin/env bash
# Online-adaptation launcher (parity: reference scripts/adapt.sh).
set -euo pipefail
cd "$(dirname "$0")/.."

RUN_NAME="${RUN_NAME:-adapt_run}"
CONFIG="${CONFIG:-cfg/adapt_cityscapes_kitti_360.yaml}"
CHECKPOINT="${CHECKPOINT:?Set CHECKPOINT to the pretraining checkpoint}"

python scripts/adapt.py \
    --run_name "${RUN_NAME}" \
    --filename_config "${CONFIG}" \
    --checkpoint "${CHECKPOINT}" \
    "$@"
