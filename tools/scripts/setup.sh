#!/usr/bin/env bash
# One-time workspace setup (reference scripts/setup.sh, minus that script's
# personal rsync/cluster paths): install the package, build the native C++
# extensions, link datasets into data/, and generate the KITTI infos +
# gt-database the dataloader needs.
#
# Usage:
#   KITTI_DIR=/path/to/kitti ARGO_DIR=/path/to/argo-kitti-format \
#     bash tools/scripts/setup.sh
set -eu
cd "$(dirname "$0")/../.."

# editable install (replaces the reference's `python setup.py develop` +
# CUDA extension build; our native ops compile on first import)
python -m pip install -e . --no-deps 2>/dev/null || \
  python setup.py develop 2>/dev/null || true

# pre-build the native C++ libs so the first train step doesn't pay for it
python -c "from pcdet_tpu import native; native.get_lib(); print('native libs OK')"

mkdir -p data output

# dataset links (same layout the reference's setup.sh creates)
if [ -n "${KITTI_DIR:-}" ]; then
  ln -sfn "$KITTI_DIR" data/kitti
  echo "linked data/kitti -> $KITTI_DIR"
fi
if [ -n "${ARGO_DIR:-}" ]; then
  ln -sfn "$ARGO_DIR" data/argo
  echo "linked data/argo -> $ARGO_DIR"
fi
if [ -n "${OUTPUT_DIR:-}" ]; then   # checkpoints on the big disk
  ln -sfn "$OUTPUT_DIR" output
  echo "linked output -> $OUTPUT_DIR"
fi

# KITTI infos + gt-database (reference pcdet/datasets/kitti/kitti_dataset.py
# create_kitti_infos; ours lives in tools/create_data.py)
if [ -e data/kitti/training ]; then
  python tools/create_data.py kitti --data_path data/kitti
fi
