#!/usr/bin/env bash
# End-to-end training smoke test (reference scripts/verifying_repo_works_with_training.sh):
# a short PointPillar run must start, step, checkpoint, and exit cleanly.
set -e
cd "$(dirname "$0")/.."
python tools/train.py --cfg_file tools/cfgs/pointpillar.yaml \
    --batch_size 2 --epochs 1 --workers 2 --extra_tag smoke "$@"
