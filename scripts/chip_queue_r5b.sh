#!/bin/bash
# Round-5b chip queue (reprioritized mid-round): the r4b/r5 data says the
# gather levers alone cannot close SECOND 19 -> 30 fps — a subm conv splits
# roughly half rulebook-build / half gather (PERF_NOTES round-1 profile), so
# the UNMEASURED bitmap lookup backend (kills the rulebook sorts) moves up
# front, with the TV=256 tile height (microbench: packed rows 33.6 -> 22.9
# ms/batch) and the new segment kernel.  The 2 h verify-parta2 step from
# chip_queue_r5.sh is dropped: it cannot fit before round end.
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
           PROFILE_EVAL_STAGES.json PROFILE_BENCH_SPLIT.json; do
    [ -f "$f" ] && files+=("$f")
  done
  [ ${#files[@]} -eq 0 ] && return 0
  git add -- "${files[@]}" 2>/dev/null
  git commit -m "Chip queue r5b: measurement artifacts ($1)" \
      --only -- "${files[@]}" 2>&1 | tail -1 | tee -a $LOG
}

# 0. lowering smoke for the new segment kernels (round-4 lesson: interpret
# mode does not validate Mosaic lowering)
step smoke-seg python scripts/chip_smoke.py
commit_artifacts smoke-seg

# 1. decision microbenches: seg kernel vs rows at TV=64/256, then the
# bitmap-vs-sort rulebook lookup at the three hot SECOND levels
step seg-tv64 python scripts/exp_xwin_loads.py
step seg-tv256 env PCDET_GATHER_TV=256 python scripts/exp_xwin_loads.py
step bitmap-micro python scripts/exp_bitmap_lookup.py
commit_artifacts microbenches

# 2. e2e SECOND B8 eval: TV=256 rows (measured microbench win), bitmap
# lookups on top, then the segment kernel contender
step bench-b8-tv256 env PCDET_GATHER_TV=256 \
    python scripts/bench_models.py --models second --batch_size 8 --eval_only
step bench-b8-bitmap-tv256 env PCDET_SPARSE_LOOKUP=bitmap PCDET_GATHER_TV=256 \
    python scripts/bench_models.py --models second --batch_size 8 --eval_only
step bench-b8-seg-tv256 env PCDET_GATHER_SEG=1 PCDET_GATHER_TV=256 \
    python scripts/bench_models.py --models second --batch_size 8 --eval_only
commit_artifacts second-e2e

# 3. Part-A2 B8 eval at the leading combo (stage-1 UNet shares the kernels)
step parta2-b8-tv256 env PCDET_GATHER_TV=256 \
    python scripts/bench_models.py --models parta2 --batch_size 8 --eval_only
step parta2-b8-bitmap-tv256 env PCDET_SPARSE_LOOKUP=bitmap PCDET_GATHER_TV=256 \
    python scripts/bench_models.py --models parta2 --batch_size 8 --eval_only
commit_artifacts parta2-e2e

# 4. PointPillar: flagship bench (bf16 BEV canvas a10e96a now active,
# unmeasured) + the non-model-half split profile (round-5 lead) + byte whales
step bench-flagship python bench.py
step bench-split python scripts/profile_bench_split.py
step hbm-ops python scripts/profile_hbm_ops.py --models pointpillar
step pp-b8 python scripts/bench_models.py --models pointpillar \
    --batch_size 8 --eval_only
commit_artifacts pointpillar

# 5. train refresh at the winning eval combo (VERDICT r5 #6) + seg dW A/B
step train-b8 python scripts/bench_models.py --models second,parta2 \
    --batch_size 8
step train-b8-segdw env PCDET_GATHER_SEG_DW=1 \
    python scripts/bench_models.py --models second --batch_size 8
commit_artifacts train-refresh

echo "=== chip queue r5b done $(date)" | tee -a $LOG
