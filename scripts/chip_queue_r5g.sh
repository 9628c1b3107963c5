#!/bin/bash
# Round-5g chip queue — PFN max-commute A/B + the r5f roofline refresh that
# never ran.  (ps-check for live chip_queue*.sh first — queue-hygiene rule.)
#   1. PointPillar B8 + flagship bench with the PFN eval restructure
#      (vfe.py max-past-monotone-BN commute; bit-identical, byte-diet for
#      the r5e hbm-ops whale: the (8,40000,32,64) f32 BN/ReLU chain)
#   2. hbm-ops refresh to confirm the whale is gone
#   3. roofline refresh for the sparse models under the host-books default
#      (documents that SECOND eval is no longer issue-bound; r4 diagnosis
#      was 5.4% MFU / 13.7% HBM with the device book chain in-graph)
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
  git commit -m "Chip queue r5g: measurement artifacts ($1)" \
      --only -- "${files[@]}" 2>&1 | tail -1 | tee -a $LOG
}

step pp-b8-commute python scripts/bench_models.py --models pointpillar_eval \
    --batch_size 8
step bench-flagship python bench.py
step hbm-ops python scripts/profile_hbm_ops.py --models pointpillar
commit_artifacts pointpillar-commute

step roofline-sparse python scripts/roofline.py --models second,parta2
commit_artifacts roofline-sparse

echo "--- [r5g done] $(date)" | tee -a $LOG
