#!/usr/bin/env bash
# Single-host evaluation under SLURM (reference
# tools/scripts/slurm_test_single.sh): one task, one TPU host; all flags
# pass through to tools/test.py (e.g. --cfg_file ... --ckpt ... or
# --eval_all).
set -x
PARTITION=$1
PY_ARGS=${@:2}

srun -p "${PARTITION}" \
    --job-name="${JOB_NAME:-pcdet_tpu_eval}" \
    --ntasks=1 \
    --ntasks-per-node=1 \
    --kill-on-bad-exit=1 \
    python -u tools/test.py ${PY_ARGS}
