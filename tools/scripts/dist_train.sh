#!/usr/bin/env bash
# Single-host multi-chip training: one process drives all local TPU chips
# (jax data mesh replaces torch.distributed.launch; the global batch is
# split over jax.device_count() automatically).
set -e
CFG=${1:-tools/cfgs/pointpillar.yaml}
BATCH=${2:-32}
shift 2 || true
python tools/train.py --cfg_file "$CFG" --batch_size "$BATCH" "$@"
