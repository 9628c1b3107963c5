#!/bin/bash
# Round-5c chip queue. Context: TV=256 is now the committed production
# default (e2e 21.6 vs 19.04 fps SECOND B8 eval); the bitmap lookup lost its
# microbench at every level (2-2.7x slower than sort — CHIP_QUEUE_LOG
# bitmap-micro) and was deleted. New this queue: the window-rank lookup
# backend (Pallas, kills the per-book bitonic sort) and the segment gather
# kernel (microbench winner at TV=256: packed seg 21.14 vs rows 23.14 fwd,
# dW seg 32.99 vs xwin 46.59). Plus the PointPillar byte-diet set and the
# train refresh (VERDICT r5 #6).
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
  git commit -m "Chip queue r5c: measurement artifacts ($1)" \
      --only -- "${files[@]}" 2>&1 | tail -1 | tee -a $LOG
}

# 0. lowering smoke at the new TV=256 default + the window-lookup kernel
# (round-4 lesson: interpret mode does not validate Mosaic lowering)
step smoke python scripts/chip_smoke.py
commit_artifacts smoke

# 1. lookup-backend microbench: sort vs window at the three hot levels
step lookup-micro python scripts/exp_lookup_backends.py
commit_artifacts lookup-micro

# 2. SECOND B8 eval e2e ladder: stock refresh at the new TV=256 default
# (compile cache warm from the r5b tv256 pass), then window lookups, seg
# gathers, both
step bench-b8-stock \
    python scripts/bench_models.py --models second --batch_size 8 --eval_only
step bench-b8-window env PCDET_SPARSE_LOOKUP=window \
    python scripts/bench_models.py --models second --batch_size 8 --eval_only
step bench-b8-seg env PCDET_GATHER_SEG=1 \
    python scripts/bench_models.py --models second --batch_size 8 --eval_only
step bench-b8-seg-window env PCDET_GATHER_SEG=1 PCDET_SPARSE_LOOKUP=window \
    python scripts/bench_models.py --models second --batch_size 8 --eval_only
commit_artifacts second-e2e

# 3. Part-A2 B8 eval at stock (new TV default) then the leading combo
step parta2-b8 \
    python scripts/bench_models.py --models parta2 --batch_size 8 --eval_only
step parta2-b8-seg-window env PCDET_GATHER_SEG=1 PCDET_SPARSE_LOOKUP=window \
    python scripts/bench_models.py --models parta2 --batch_size 8 --eval_only
commit_artifacts parta2-e2e

# 4. where does the SECOND eval step go now (rulebook-vs-gather split)
step eval-stages python scripts/profile_eval_stages.py --models second
commit_artifacts eval-stages

# 5. PointPillar: flagship bench (bf16 BEV canvas a10e96a now active,
# unmeasured) + the non-model-half split profile (round-5 lead) + byte whales
step bench-flagship python bench.py
step bench-split python scripts/profile_bench_split.py
step hbm-ops python scripts/profile_hbm_ops.py --models pointpillar
step pp-b8 python scripts/bench_models.py --models pointpillar \
    --batch_size 8 --eval_only
commit_artifacts pointpillar

# 6. train refresh at the new defaults (VERDICT r5 #6) + seg dW and window A/Bs
step train-b8 python scripts/bench_models.py --models second,parta2 \
    --batch_size 8
step train-b8-segdw env PCDET_GATHER_SEG_DW=1 \
    python scripts/bench_models.py --models second --batch_size 8
step train-b8-window env PCDET_SPARSE_LOOKUP=window \
    python scripts/bench_models.py --models second --batch_size 8
commit_artifacts train-refresh

echo "=== chip queue r5c done $(date)" | tee -a $LOG
