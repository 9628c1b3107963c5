#!/bin/bash
# Round-5 chip queue: validate + A/B the SEGMENT gather kernel (one (S, Cin)
# block load + one-hot MXU routing per (tile, group) — built for the
# issue-bound SECOND eval roofline), cash the TV=256 tile-height win the
# r4b microbench measured (packed rows 33.6 -> 22.9 ms/batch), then refresh
# the e2e model numbers at the winners.  Commits artifacts after every step.
set -u
cd "$(dirname "$0")/.."
LOG=CHIP_QUEUE_LOG.txt

step() {
  echo "--- [$1] $(date)" | tee -a $LOG
  shift
  timeout 3600 "$@" 2>&1 | grep -v WARNING | tee -a $LOG
}

commit_artifacts() {
  local files=()
  for f in CHIP_QUEUE_LOG.txt BENCH_MODELS.json ROOFLINE.json \
           PROFILE_EVAL_STAGES.json PROFILE_BENCH_SPLIT.json; do
    [ -f "$f" ] && files+=("$f")
  done
  [ ${#files[@]} -eq 0 ] && return 0
  git add -- "${files[@]}" 2>/dev/null
  git commit -m "Chip queue r5: measurement artifacts ($1)" \
      --only -- "${files[@]}" 2>&1 | tail -1 | tee -a $LOG
}

# 0. lowering smoke for the new segment kernels (round-4 lesson: interpret
# mode does not validate Mosaic lowering)
step smoke-seg python scripts/chip_smoke.py
commit_artifacts smoke-seg

# 1. segment kernel microbench vs rows at TV=64 and the TV=256 winner
step seg-tv64 python scripts/exp_xwin_loads.py
step seg-tv256 env PCDET_GATHER_TV=256 python scripts/exp_xwin_loads.py
commit_artifacts seg-microbench

# 2. e2e SECOND B8 eval at the three contenders: TV=256 rows (the measured
# microbench win), seg at TV=64, seg at TV=256
step bench-b8-tv256 env PCDET_GATHER_TV=256 \
    python scripts/bench_models.py --models second --batch_size 8 --eval_only
step bench-b8-seg env PCDET_GATHER_SEG=1 \
    python scripts/bench_models.py --models second --batch_size 8 --eval_only
step bench-b8-seg-tv256 env PCDET_GATHER_SEG=1 PCDET_GATHER_TV=256 \
    python scripts/bench_models.py --models second --batch_size 8 --eval_only
commit_artifacts second-e2e

# 3. Part-A2 B8 eval at the same contenders (stage-1 UNet shares the kernels)
step parta2-b8-tv256 env PCDET_GATHER_TV=256 \
    python scripts/bench_models.py --models parta2 --batch_size 8 --eval_only
step parta2-b8-seg-tv256 env PCDET_GATHER_SEG=1 PCDET_GATHER_TV=256 \
    python scripts/bench_models.py --models parta2 --batch_size 8 --eval_only
commit_artifacts parta2-e2e

# 4. PointPillar: flagship bench (bf16 BEV canvas a10e96a now active,
# unmeasured) + the non-model-half split profile (round-5 lead)
step bench-flagship python bench.py
step bench-split python scripts/profile_bench_split.py
step hbm-ops python scripts/profile_hbm_ops.py --models pointpillar
step pp-b8 python scripts/bench_models.py --models pointpillar \
    --batch_size 8 --eval_only
commit_artifacts pointpillar

# 5. train refresh at the split policy + seg dW A/B (VERDICT r5 #6)
step train-b8 python scripts/bench_models.py --models second,parta2 \
    --batch_size 8
step train-b8-segdw env PCDET_GATHER_SEG_DW=1 \
    python scripts/bench_models.py --models second --batch_size 8
commit_artifacts train-refresh

# 6. verify recipe extended to Part-A² (VERDICT r5 #7): smoke train through
# the real CLI, then the eval AP string.  The eval compile alone is
# ~25-40 min through the tunnel — one uninterrupted timeout 3500.
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
commit_artifacts verify-parta2

echo "=== chip queue r5 done $(date)" | tee -a $LOG
