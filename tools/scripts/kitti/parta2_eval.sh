#!/usr/bin/env bash
# KITTI Part-A² pseudolidar eval-all watcher (reference
# scripts/kitti/parta2_eval.sh).
set -eu
cd "$(dirname "$0")/../../.."

NAME=${NAME:-parta2_pl2_semantic_injection}
PL_DIR=${PL_DIR:-data/kitti_pl2/sdn_kitti_train_set_sparse}
RUN=${DRYRUN:+echo}

$RUN python tools/test.py \
  --cfg_file tools/cfgs/PartA2_car.yaml \
  --batch_size "${BATCH:-16}" \
  --extra_tag "$NAME" \
  --eval_all \
  --set \
  DATA_CONFIG.FOV_POINTS_ONLY True \
  DATA_CONFIG.AUGMENTATION.NOISE_PER_OBJECT.ENABLED False \
  DATA_CONFIG.AUGMENTATION.NOISE_GLOBAL_SCENE.ENABLED False \
  DATA_CONFIG.AUGMENTATION.DB_SAMPLER.ENABLED False \
  ALTERNATE_PT_CLOUD_ABS_DIR "$PL_DIR"
