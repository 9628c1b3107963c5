#!/bin/bash
# Round-5e chip queue — the decisive host-books A/Bs plus the remaining
# r5d leftovers.  Context: stock SECOND B8 eval = 21.74 fps (TV=256,
# 18:43 clean row); the lookup-micro run sized the DEVICE rulebook chain
# at ~83 ms of a ~368 ms step, and host-built books (dbc67a2..e328705)
# move that work to the loader's producer thread.  This queue measures:
#   1. host-books e2e for SECOND/Part-A2 (eval + train)
#   2. Part-A2 stock refresh at the TV=256 default (r5d row was voided
#      by the queue-overlap incident)
#   3. where the SECOND step goes once books are host-built (stage split)
#   4. the seg dW train A/B (last live seg variant; delete family if it
#      loses e2e like seg fwd did)
#   5. PointPillar byte-diet set: flagship bench (bf16 canvas a10e96a
#      active), non-model-half split, HBM whales, B8 row
#   6. train refreshes at settled defaults (VERDICT r4 #6)
# Rule (PERF_NOTES queue-hygiene incident): check for live chip_queue*.sh
# bash processes BEFORE launching; kill by PID only.
set -u
cd "$(dirname "$0")/.."
LOG=CHIP_QUEUE_LOG.txt

step() {
  echo "--- [$1] $(date)" | tee -a $LOG
  shift
  timeout 3000 "$@" 2>&1 | grep -v WARNING | tee -a $LOG
}

commit_artifacts() {
  local files=()
  for f in CHIP_QUEUE_LOG.txt BENCH_MODELS.json ROOFLINE.json \
           PROFILE_EVAL_STAGES.json PROFILE_BENCH_SPLIT.json \
           PROFILE_HBM_OPS.json; do
    [ -f "$f" ] && files+=("$f")
  done
  [ ${#files[@]} -eq 0 ] && return 0
  git add -- "${files[@]}" 2>/dev/null
  git commit -m "Chip queue r5e: measurement artifacts ($1)" \
      --only -- "${files[@]}" 2>&1 | tail -1 | tee -a $LOG
}

# 1. SECOND B8 host-books: eval first (the 0.725x -> ? lever), then train
step second-hostbooks env PCDET_HOST_BOOKS=1 \
    python scripts/bench_models.py --models second --batch_size 8
commit_artifacts second-hostbooks

# 2. Part-A2 B8 stock eval refresh at TV=256 (r5d row voided by overlap)
step parta2-stock \
    python scripts/bench_models.py --models parta2 --batch_size 8 --eval_only
commit_artifacts parta2-stock

# 3. Part-A2 B8 host-books (eval + train)
step parta2-hostbooks env PCDET_HOST_BOOKS=1 \
    python scripts/bench_models.py --models parta2 --batch_size 8
commit_artifacts parta2-hostbooks

# 4. SECOND per-stage split under host books: names the next lever if
# host-books alone lands short of 30 fps
step eval-stages-hostbooks env PCDET_HOST_BOOKS=1 \
    python scripts/profile_eval_stages.py --models second
commit_artifacts eval-stages

# 5. seg dW train A/B (microbench won -29%; fwd already lost e2e).
# Loses -> delete the seg family per the consolidation mandate.
step second-train-segdw env PCDET_GATHER_SEG_DW=1 \
    python scripts/bench_models.py --models second --batch_size 8 --train_only
commit_artifacts segdw

# 6. stock train refreshes at the settled TV=256 defaults (VERDICT r4 #6)
step second-train-stock \
    python scripts/bench_models.py --models second --batch_size 8 --train_only
step parta2-train-stock \
    python scripts/bench_models.py --models parta2 --batch_size 8 --train_only
commit_artifacts train-refresh

# 7. PointPillar byte-diet set: flagship bench (bf16 BEV canvas a10e96a now
# active, unmeasured), the non-model-half split (round-5 lead), HBM whales,
# B8 batch-decay row
step bench-flagship python bench.py
step bench-split python scripts/profile_bench_split.py
step pp-b8 python scripts/bench_models.py --models pointpillar_eval \
    --batch_size 8
step hbm-ops python scripts/profile_hbm_ops.py --models pointpillar
commit_artifacts pointpillar

echo "--- [r5e done] $(date)" | tee -a $LOG
