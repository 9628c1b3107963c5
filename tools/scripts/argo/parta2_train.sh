#!/usr/bin/env bash
# Argoverse Part-A² training (reference scripts/argo/parta2_train.sh).
#
# TPU-native changes: no torch.distributed.launch / CUDA_VISIBLE_DEVICES —
# one process drives every local TPU chip through the jax data mesh, and
# batch-norm stats are synced by the mesh all-reduce (no --sync_bn flag).
# DEBUG=true keeps the reference's small-batch single-worker debug entry.
set -eu
cd "$(dirname "$0")/../../.."

DEBUG=${DEBUG:-false}
NAME=${NAME:-argo_parta2_centered}
RUN=${DRYRUN:+echo}

if [ "$DEBUG" = true ]; then
  $RUN python tools/train.py \
    --cfg_file tools/cfgs/argo/PartA2_centered.yaml \
    --extra_tag "debug_$RANDOM" \
    --batch_size 2 \
    --workers 0
  exit 0
fi

$RUN python tools/train.py \
  --cfg_file tools/cfgs/argo/PartA2_centered.yaml \
  --extra_tag "$NAME" \
  --batch_size "${BATCH:-36}" \
  ${PRETRAINED:+--pretrained_model "$PRETRAINED"} \
  --set \
  MODEL.TRAIN.OPTIMIZATION.LR 0.0003 \
  DATA_CONFIG.VOXEL_GENERATOR.MAX_POINTS_PER_VOXEL 7
