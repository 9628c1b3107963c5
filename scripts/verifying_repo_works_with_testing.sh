#!/usr/bin/env bash
# End-to-end eval smoke test: evaluate the newest smoke checkpoint.
set -e
cd "$(dirname "$0")/.."
CKPT=$(ls -t output/pointpillar/smoke/ckpt/ | head -n1)
python tools/test.py --cfg_file tools/cfgs/pointpillar.yaml \
    --ckpt "output/pointpillar/smoke/ckpt/${CKPT}" --extra_tag smoke "$@"
