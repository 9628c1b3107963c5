#!/usr/bin/env bash
# Argoverse PointPillar BEV-seg training (reference
# scripts/argo/pointpillar_train.sh): the fork's pseudolidar + BEV mode
# experiment.  DEBUG=true mirrors the reference's single-process debug entry
# (semantic injection on); the full run trains the BEV head from pseudolidar
# without injection, exactly the reference's launched configuration.
set -eu
cd "$(dirname "$0")/../../.."

DEBUG=${DEBUG:-false}
NAME=${NAME:-sord_nosemantics_0}
RUN=${DRYRUN:+echo}

if [ "$DEBUG" = true ]; then
  $RUN python tools/train.py \
    --cfg_file tools/cfgs/argo/pointpillar_forward50x50.yaml \
    --batch_size 1 \
    --workers 0 \
    --extra_tag "debug_$RANDOM" \
    --set \
    DATA_CONFIG.TRAIN.SHUFFLE_POINTS False \
    MODE bev \
    INJECT_SEMANTICS True \
    INJECT_SEMANTICS_WIDTH 1250 \
    INJECT_SEMANTICS_MODE binary_car_mask \
    USE_PSEUDOLIDAR True \
    SPARSIFY_PL_PTS True
  exit 0
fi

$RUN python tools/train.py \
  --cfg_file tools/cfgs/argo/pointpillar_forward50x50.yaml \
  --extra_tag "$NAME" \
  --batch_size "${BATCH:-15}" \
  --set \
  MODE bev \
  INJECT_SEMANTICS False \
  INJECT_SEMANTICS_WIDTH 1250 \
  INJECT_SEMANTICS_MODE binary_car_mask \
  USE_PSEUDOLIDAR True \
  SPARSIFY_PL_PTS False
