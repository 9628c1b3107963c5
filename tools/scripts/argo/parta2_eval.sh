#!/usr/bin/env bash
# Argoverse Part-A² eval-all watcher (reference scripts/argo/parta2_eval.sh):
# evaluates every checkpoint the training job writes, as they appear.
set -eu
cd "$(dirname "$0")/../../.."

NAME=${NAME:-argo_parta2_centered}
RUN=${DRYRUN:+echo}

$RUN python tools/test.py \
  --cfg_file tools/cfgs/argo/PartA2_centered.yaml \
  --batch_size "${BATCH:-14}" \
  --extra_tag "$NAME" \
  --eval_all \
  --set \
  DATA_CONFIG.VOXEL_GENERATOR.MAX_POINTS_PER_VOXEL 7
