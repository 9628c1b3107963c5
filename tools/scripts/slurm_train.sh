#!/usr/bin/env bash
# Multi-host training under SLURM: one task per host; jax.distributed reads
# the coordinator from the first node (replaces the reference's NCCL+scontrol
# rendezvous).
#SBATCH --ntasks-per-node=1
set -e
CFG=${1:-tools/cfgs/pointpillar.yaml}
BATCH=${2:-32}
shift 2 || true
MASTER=$(scontrol show hostname "$SLURM_NODELIST" | head -n1)
export JAX_COORDINATOR_ADDRESS="${MASTER}:12345"
export JAX_NUM_PROCESSES="$SLURM_NTASKS"
export JAX_PROCESS_ID="$SLURM_PROCID"
srun --kill-on-bad-exit=1 python tools/train.py --cfg_file "$CFG" \
    --batch_size "$BATCH" --multi_host "$@"
