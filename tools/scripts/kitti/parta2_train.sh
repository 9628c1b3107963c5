#!/usr/bin/env bash
# KITTI Part-A² pseudolidar + semantic-injection training (reference
# scripts/kitti/parta2_train.sh).  DEBUG=true is the reference's
# single-process debug entry (BTS monocular pseudolidar); the full run is
# its launched pl2 + semantic-injection configuration, minus the personal
# cluster paths (point ALTERNATE_PT_CLOUD_ABS_DIR at your pseudolidar dump).
set -eu
cd "$(dirname "$0")/../../.."

DEBUG=${DEBUG:-false}
NAME=${NAME:-parta2_pl2_semantic_injection}
PL_DIR=${PL_DIR:-data/kitti_pl2/sdn_kitti_train_set_sparse}
RUN=${DRYRUN:+echo}

if [ "$DEBUG" = true ]; then
  $RUN python tools/train.py \
    --cfg_file tools/cfgs/PartA2_car.yaml \
    --batch_size 2 \
    --extra_tag "debug_$RANDOM" \
    ${PRETRAINED:+--pretrained_model "$PRETRAINED"} \
    --workers 0 \
    --set \
    INJECT_SEMANTICS True \
    INJECT_SEMANTICS_HEIGHT 375 \
    INJECT_SEMANTICS_WIDTH 1240 \
    INJECT_SEMANTICS_MODE logit_car_mask \
    DATA_CONFIG.FOV_POINTS_ONLY True \
    DATA_CONFIG.AUGMENTATION.NOISE_PER_OBJECT.ENABLED False \
    DATA_CONFIG.AUGMENTATION.NOISE_GLOBAL_SCENE.ENABLED False \
    DATA_CONFIG.AUGMENTATION.DB_SAMPLER.ENABLED False \
    ALTERNATE_PT_CLOUD_ABS_DIR "$PL_DIR"
  exit 0
fi

$RUN python tools/train.py \
  --cfg_file tools/cfgs/PartA2_car.yaml \
  --batch_size "${BATCH:-21}" \
  --extra_tag "$NAME" \
  --epochs 200 \
  --set \
  DATA_CONFIG.FOV_POINTS_ONLY True \
  DATA_CONFIG.AUGMENTATION.NOISE_PER_OBJECT.ENABLED False \
  DATA_CONFIG.AUGMENTATION.NOISE_GLOBAL_SCENE.ENABLED False \
  DATA_CONFIG.AUGMENTATION.DB_SAMPLER.ENABLED False \
  ALTERNATE_PT_CLOUD_ABS_DIR "$PL_DIR" \
  INJECT_SEMANTICS True \
  INJECT_SEMANTICS_HEIGHT 375 \
  INJECT_SEMANTICS_WIDTH 1240
