#!/bin/bash
# Round-5f chip queue — post-host-books evidence refresh.  Runs AFTER r5e
# (ps-check for live chip_queue*.sh first — queue-hygiene rule).
#   1. roofline refresh for the sparse models under the host-books default:
#      documents that SECOND eval is no longer issue-bound (r4 diagnosis
#      was 5.4% MFU / 13.7% HBM with the device book chain in-graph)
#   2. stamped measured_at rows land via commit_artifacts
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
  git commit -m "Chip queue r5f: measurement artifacts ($1)" \
      --only -- "${files[@]}" 2>&1 | tail -1 | tee -a $LOG
}

step roofline-sparse python scripts/roofline.py --models second,parta2
commit_artifacts roofline-sparse

echo "--- [r5f done] $(date)" | tee -a $LOG
