#!/bin/bash
# Round-5d chip queue. Context: r5c measured stock SECOND B8 eval at the
# new TV=256 default = 21.74 fps (0.725x CUDA, was 19.04 at TV=64); the
# window lookup backend lost its microbench 3x at every level AND failed
# the TV=256 lowering smoke -> deleted (this queue has no window steps).
# Remaining A/Bs: segment gather e2e (microbench winner: fwd 21.14 vs rows
# 23.14 ms, dW 32.99 vs xwin 46.59), Part-A2 refresh at TV=256, the
# PointPillar byte-diet set (bf16 canvas a10e96a still unmeasured), and
# the train refresh (VERDICT r4 #6).
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
  git commit -m "Chip queue r5d: measurement artifacts ($1)" \
      --only -- "${files[@]}" 2>&1 | tail -1 | tee -a $LOG
}

# 1. SECOND B8 eval: segment-gather fwd A/B vs the 21.74 stock row
step bench-b8-seg env PCDET_GATHER_SEG=1 \
    python scripts/bench_models.py --models second --batch_size 8 --eval_only
commit_artifacts second-seg

# 2. Part-A2 B8 eval: stock refresh at TV=256, then seg fwd
step parta2-b8 \
    python scripts/bench_models.py --models parta2 --batch_size 8 --eval_only
step parta2-b8-seg env PCDET_GATHER_SEG=1 \
    python scripts/bench_models.py --models parta2 --batch_size 8 --eval_only
commit_artifacts parta2-e2e

# 3. where does the SECOND eval step go now (rulebook-vs-gather split at
# the TV=256 default; informs the host-rulebook pipeline sizing)
step eval-stages python scripts/profile_eval_stages.py --models second
commit_artifacts eval-stages

# 4. PointPillar: flagship bench (bf16 BEV canvas a10e96a now active,
# unmeasured) + the non-model-half split profile (round-5 lead) + byte whales
step bench-flagship python bench.py
step bench-split python scripts/profile_bench_split.py
step hbm-ops python scripts/profile_hbm_ops.py --models pointpillar
step pp-b8 python scripts/bench_models.py --models pointpillar \
    --batch_size 8 --eval_only
commit_artifacts pointpillar

# 5. train refresh moved to the final queue (r5e): it should run at the
# settled kernel defaults (seg verdict + host-books A/B) per VERDICT r4 #6.

echo "=== chip queue r5d done $(date)" | tee -a $LOG
