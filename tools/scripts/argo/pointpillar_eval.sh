#!/usr/bin/env bash
# Argoverse PointPillar BEV-seg eval-all watcher (reference
# scripts/argo/pointpillar_eval.sh).
set -eu
cd "$(dirname "$0")/../../.."

NAME=${NAME:-sord_nosemantics_0}
RUN=${DRYRUN:+echo}

$RUN python tools/test.py \
  --cfg_file tools/cfgs/argo/pointpillar_forward50x50.yaml \
  --batch_size "${BATCH:-18}" \
  --extra_tag "$NAME" \
  --workers 4 \
  --eval_all \
  --set \
  MODE bev \
  INJECT_SEMANTICS False \
  INJECT_SEMANTICS_WIDTH 1250 \
  INJECT_SEMANTICS_MODE binary_car_mask \
  USE_PSEUDOLIDAR True \
  SPARSIFY_PL_PTS False
