#!/bin/bash
# Sequential chip-work queue for when the axon tunnel is healthy.
# Ordering principle (round-4, limited tunnel windows): headline perf
# measurements FIRST, long CLI verifies LAST, and artifacts are committed
# after every group — a mid-queue tunnel flap must not lose the numbers.
set -u
cd "$(dirname "$0")/.."
LOG=CHIP_QUEUE_LOG.txt
# rotate: gate regexes below parse THIS run's output, not a stale one's
[ -f $LOG ] && mv $LOG CHIP_QUEUE_LOG.prev.txt
echo "=== chip queue started $(date)" | tee -a $LOG

step() {
  echo "--- [$1] $(date)" | tee -a $LOG
  shift
  timeout 5400 "$@" 2>&1 | grep -v WARNING | tee -a $LOG
}

commit_artifacts() {
  # only name files that exist: one missing pathspec (e.g. ROOFLINE.json
  # before the roofline step) aborts the whole add AND the commit
  local files=()
  for f in CHIP_QUEUE_LOG.txt BENCH_MODELS.json ROOFLINE.json \
           PROFILE_EVAL_STAGES.json; do
    [ -f "$f" ] && files+=("$f")
  done
  git add -- "${files[@]}" 2>/dev/null
  git -c user.name="$(git config user.name || echo chip-queue)" \
      -c user.email="$(git config user.email || echo chip-queue@local)" \
      commit -m "Chip queue: measurement artifacts ($1)" \
      --only -- "${files[@]}" 2>&1 | tail -1 | tee -a $LOG
}

# 0. tiny-shape lowering + numerics smoke of EVERY Pallas kernel path.
# Interpret-mode CPU tests don't see Mosaic's lowering constraints (the
# round-3 tile gate lowered nowhere on real TPU); catch that in minutes
# before burning hours of queued compiles.  If the smoke fails, fall back
# to the chip-proven ungated kernels rather than aborting unattended.
step smoke python scripts/chip_smoke.py
if ! grep -q 'chip smoke: 0 failures' $LOG; then
  echo "KERNEL SMOKE FAILED — PCDET_DISABLE_TILE_GATE=1 fallback for the rest" \
    | tee -a $LOG
  export PCDET_DISABLE_TILE_GATE=1
fi

# 1. x-window kernel numerics + speed vs the per-row kernels
step xwin python scripts/exp_xwin_loads.py
if ! python - <<'EOF'
import re
txt = open('CHIP_QUEUE_LOG.txt').read()
ms = re.findall(r'f32  xwin vs rows max rel err: ([0-9.e+-]+)', txt)
assert ms, 'xwin experiment produced no error line'
assert float(ms[-1]) < 1e-3, 'xwin numerics off: %s' % ms[-1]
EOF
then
  echo "XWIN NUMERICS GATE FAILED — disabling x-window kernels for the rest" \
    | tee -a $LOG
  export PCDET_DISABLE_XWIN=1
fi
commit_artifacts kernels

# 2. sparse model benches at B8 and B2 — the headline numbers (VERDICT #1)
step bench-b8 python scripts/bench_models.py --models second,parta2 --batch_size 8
step bench-b2 python scripts/bench_models.py --models second,parta2
commit_artifacts sparse-bench

# 3. PointPillar batch scaling with the batched NMS (VERDICT #3: B8>=B2).
# bench.py: full raw-scan path incl. on-device voxelize; bench_models rows
# recorded to BENCH_MODELS.json.
step pp-b16 env BENCH_BATCH=16 python bench.py
step pp-b8 env BENCH_BATCH=8 python bench.py
step pp-b4 env BENCH_BATCH=4 python bench.py
step pp-b2 python bench.py
step pp-rows-b2 python scripts/bench_models.py --models pointpillar_eval --batch_size 2
step pp-rows-b4 python scripts/bench_models.py --models pointpillar_eval --batch_size 4
step pp-rows-b8 python scripts/bench_models.py --models pointpillar_eval --batch_size 8
commit_artifacts pp-scaling

# 4. lever A/Bs on the SECOND/Part-A² eval step
# 4a. dense-tail (ops/dense.py): conv4/conv_out as masked dense conv3d.
step bench-b8-dtail-subm env PCDET_DENSE_TAIL=subm \
    python scripts/bench_models.py --models second,parta2 --batch_size 8
step bench-b8-dtail-full env PCDET_DENSE_TAIL=full \
    python scripts/bench_models.py --models second --batch_size 8
step bench-b8-dtail-conv3 env PCDET_DENSE_TAIL=conv3 \
    python scripts/bench_models.py --models second --batch_size 8
commit_artifacts dense-tail

# 4b. e2e under the bitmap / per-level-auto lookup backends (fresh compile;
# decides whether the sort-free rulebooks become the TPU default)
step bench-b8-bitmap env PCDET_SPARSE_LOOKUP=bitmap \
    python scripts/bench_models.py --models second --batch_size 8
step bench-b8-auto env PCDET_SPARSE_LOOKUP=auto \
    python scripts/bench_models.py --models second,parta2 --batch_size 8
# bitmap at EVERY level (the full-res conv1 grid is 92M cells — presence
# bitmap 11.6 MB/sample, cumsum ~2-3 ms at B8; whether it beats the conv1
# book's merged sort is an open question this answers)
step bench-b8-bitmap-all env PCDET_SPARSE_LOOKUP=auto \
    PCDET_BITMAP_MAX_CELLS=200000000 PCDET_BENCH_TAG=_allbitmap \
    python scripts/bench_models.py --models second --batch_size 8
commit_artifacts lookup-backends

# 4c. occupancy-gated tile skipping A/B (gate is default-on; this measures
# what it buys at bench occupancy — real-KITTI scenes sit further below
# the caps, so the deploy win is larger than this number)
step bench-b8-nogate env PCDET_DISABLE_TILE_GATE=1 \
    python scripts/bench_models.py --models second --batch_size 8

# 4e. upper end of the batch-scaling curve (batched NMS + lazy decode may
# keep paying past B8)
step bench-b16 python scripts/bench_models.py --models second --batch_size 16
commit_artifacts lever-ab

# 5. microprofiles + roofline (VERDICT #4)
step conv2 python scripts/profile_conv2.py
step bitmap python scripts/exp_bitmap_lookup.py
step stages python scripts/profile_eval_stages.py \
    --models second,second_backbone,parta2,parta2_unet,pointpillar
step roofline python scripts/roofline.py
commit_artifacts profiles

# 6. gather tile-size sweep: TV=64 underfills the MXU's 128 rows; bigger
# tiles halve per-dot overhead if load issue isn't the binding limit.
# (step 1 already times TV=64 incl. the gated variants)
step tv128 env PCDET_GATHER_TV=128 python scripts/exp_xwin_loads.py
step tv256 env PCDET_GATHER_TV=256 python scripts/exp_xwin_loads.py

commit_artifacts sweeps

# 8. verify recipe: SECOND smoke through the real CLI (sparse path e2e)
rm -rf output/synthetic_smoke_second/verify
step verify-train python tools/train.py \
    --cfg_file tools/cfgs/synthetic_smoke_second.yaml \
    --batch_size 2 --epochs 300 --workers 0 --extra_tag verify
CKPT=$(python -c "from pcdet_tpu.train.checkpoint import latest_checkpoint; print(latest_checkpoint('output/synthetic_smoke_second/verify/ckpt'))")
step verify-eval python tools/test.py \
    --cfg_file tools/cfgs/synthetic_smoke_second.yaml \
    --batch_size 2 --workers 0 --extra_tag verify --ckpt "$CKPT"
commit_artifacts verify-second

# 9. two-stage path through the CLI (stage-2 changed in round 3: lazy
# proposals + bf16 RCNN; round 3 also fixed host-voxelizer id ordering) —
# Part-A2 EVAL compile alone is ~25-40 min, so it runs LAST: if the tunnel
# flaps mid-queue, the perf measurements above have already landed.
rm -rf output/synthetic_smoke_parta2/verify
step verify-train-parta2 python tools/train.py \
    --cfg_file tools/cfgs/synthetic_smoke_parta2.yaml \
    --batch_size 2 --epochs 200 --workers 0 --extra_tag verify
CKPT2=$(python -c "from pcdet_tpu.train.checkpoint import latest_checkpoint; print(latest_checkpoint('output/synthetic_smoke_parta2/verify/ckpt'))")
step verify-eval-parta2 python tools/test.py \
    --cfg_file tools/cfgs/synthetic_smoke_parta2.yaml \
    --batch_size 2 --workers 0 --extra_tag verify --ckpt "$CKPT2"
commit_artifacts verify-parta2

echo "=== chip queue done $(date)" | tee -a $LOG
