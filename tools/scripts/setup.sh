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

# environment drift check against the pinned stack the benchmarks were
# measured on (tools/scripts/environment.txt — the TPU-side equivalent of
# the reference's docker/Dockerfile).  Warn-only: newer stacks usually
# work, but Pallas lowering rules change between jaxlib releases (the
# round-4 Mosaic block-shape break), so perf/parity claims hold at pins.
python - <<'EOF'
import importlib.metadata as md
import re
from pathlib import Path

pins = {}
for line in Path('tools/scripts/environment.txt').read_text().splitlines():
    line = line.split('#')[0].strip()
    m = re.match(r'([A-Za-z0-9_.-]+)==(.+)', line)
    if m and m.group(1) != 'python':
        pins[m.group(1)] = m.group(2).strip()
for name, want in pins.items():
    try:
        got = md.version(name)
    except md.PackageNotFoundError:
        print(f'WARNING: {name} not installed (pinned {want})')
        continue
    if got.split('+')[0] != want:
        print(f'WARNING: {name}=={got} differs from pinned {want} '
              '(bench numbers were measured at the pin)')
print('environment check done')
EOF

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
