#!/bin/bash
# On-chip Part-A² verify recipe (VERDICT r5 #7 — the Part-A² twin of the
# SECOND smoke recipe archived in scripts/chip_queue.sh): smoke-train the
# two-stage model through the REAL train CLI on the synthetic dataset, then
# run the eval CLI and print the official KITTI AP string.  ~2 h end to end
# through the tunnel (the eval compile alone is ~25-40 min) — run it when
# the chip queue is idle.
set -eu
cd "$(dirname "$0")/.."
LOG=CHIP_QUEUE_LOG.txt

rm -rf output/synthetic_smoke_parta2/verify
echo "--- [verify-parta2-train] $(date)" | tee -a $LOG
timeout 3500 python tools/train.py \
    --cfg_file tools/cfgs/synthetic_smoke_parta2.yaml \
    --batch_size 2 --epochs 200 --workers 0 --extra_tag verify \
    2>&1 | grep -v WARNING | tail -5 | tee -a $LOG
CKPT=$(python -c "from pcdet_tpu.train.checkpoint import latest_checkpoint; print(latest_checkpoint('output/synthetic_smoke_parta2/verify/ckpt'))")
echo "--- [verify-parta2-eval] $(date)" | tee -a $LOG
timeout 3500 python tools/test.py \
    --cfg_file tools/cfgs/synthetic_smoke_parta2.yaml \
    --batch_size 2 --workers 0 --extra_tag verify --ckpt "$CKPT" \
    2>&1 | grep -v WARNING | tail -40 | tee -a $LOG
echo "=== verify-parta2 done $(date)" | tee -a $LOG
