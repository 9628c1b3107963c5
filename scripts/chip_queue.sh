#!/bin/bash
# Sequential chip-work queue for when the axon tunnel is healthy.
# Gated: if the x-window kernel's on-chip numerics check fails, stop before
# burning hours of compile time on a broken path.
set -u
cd "$(dirname "$0")/.."
LOG=CHIP_QUEUE_LOG.txt
echo "=== chip queue started $(date)" | tee -a $LOG

step() {
  echo "--- [$1] $(date)" | tee -a $LOG
  shift
  timeout 5400 "$@" 2>&1 | grep -v WARNING | tee -a $LOG
}

# 1. x-window kernel numerics + speed vs the per-row kernels
step xwin python scripts/exp_xwin_loads.py
if ! python - <<'EOF'
import re
txt = open('CHIP_QUEUE_LOG.txt').read()
m = re.search(r'f32  xwin vs rows max rel err: ([0-9.e+-]+)', txt)
assert m, 'xwin experiment produced no error line'
assert float(m.group(1)) < 1e-3, 'xwin numerics off: %s' % m.group(1)
EOF
then
  echo "XWIN NUMERICS GATE FAILED — disabling x-window kernels for the rest" \
    | tee -a $LOG
  export PCDET_DISABLE_XWIN=1
fi

# 2. verify recipe: SECOND smoke through the real CLI (sparse path e2e)
rm -rf output/synthetic_smoke_second/verify
step verify-train python tools/train.py \
    --cfg_file tools/cfgs/synthetic_smoke_second.yaml \
    --batch_size 2 --epochs 300 --workers 0 --extra_tag verify
CKPT=$(python -c "from pcdet_tpu.train.checkpoint import latest_checkpoint; print(latest_checkpoint('output/synthetic_smoke_second/verify/ckpt'))")
step verify-eval python tools/test.py \
    --cfg_file tools/cfgs/synthetic_smoke_second.yaml \
    --batch_size 2 --workers 0 --extra_tag verify --ckpt "$CKPT"

# 3. conv2-block microprofile (rulebook vs gather split)
step conv2 python scripts/profile_conv2.py

# 3b. rulebook lookup backends: merge-sort vs bitmap-rank
step bitmap python scripts/exp_bitmap_lookup.py

# 4. sparse model benches at B8 and B2
step bench-b8 python scripts/bench_models.py --models second,parta2 --batch_size 8
step bench-b2 python scripts/bench_models.py --models second,parta2

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

# 4c. upper end of the batch-scaling curve (batched NMS + lazy decode may
# keep paying past B8)
step bench-b16 python scripts/bench_models.py --models second --batch_size 16

# 4d. occupancy-gated tile skipping A/B (gate is default-on; this measures
# what it buys at bench occupancy — real-KITTI scenes sit further below
# the caps, so the deploy win is larger than this number)
step bench-b8-nogate env PCDET_DISABLE_TILE_GATE=1 \
    python scripts/bench_models.py --models second --batch_size 8

# 4e. gather tile-size sweep: TV=64 underfills the MXU's 128 rows; bigger
# tiles halve per-dot overhead if load issue isn't the binding limit.
# (step 1 already times TV=64 incl. the superwindow + gated variants)
step tv128 env PCDET_GATHER_TV=128 python scripts/exp_xwin_loads.py
step tv256 env PCDET_GATHER_TV=256 python scripts/exp_xwin_loads.py

# 4f. superwindow chunk-size sweep (R=8 ran in step 1; R=6 needs TV % R == 0)
step super-r6 env PCDET_GATHER_TV=96 PCDET_XWIN_SUPER_R=6 \
    python scripts/exp_xwin_loads.py
step super-r4 env PCDET_XWIN_SUPER_R=4 python scripts/exp_xwin_loads.py

# 4g. e2e SECOND bench with the superwindow kernels on (best-R pick is
# manual after 4f; R=8 is the TV=64-compatible default)
step bench-b8-super env PCDET_XWIN_SUPER=1 \
    python scripts/bench_models.py --models second --batch_size 8

# 4h. dense-tail A/B (ops/dense.py): conv4/conv_out as masked dense conv3d.
# 'subm' keeps the strided conv4_0 sparse; 'full' densifies from the /4
# input (pairs with bf16 — the /4 canvas is 1.6 GB at B8 in bf16, 3.2 f32).
step bench-b8-dtail-subm env PCDET_DENSE_TAIL=subm \
    python scripts/bench_models.py --models second,parta2 --batch_size 8
step bench-b8-dtail-full env PCDET_DENSE_TAIL=full \
    python scripts/bench_models.py --models second --batch_size 8
# conv3 mode: dense from the /4 subm pair on — only sane with bf16
# (the /4 canvas is ~200 MB/sample bf16); measures whether XLA conv3d
# MXU util at /4 beats the sparse conv3 levers
step bench-b8-dtail-conv3 env PCDET_DENSE_TAIL=conv3 \
    python scripts/bench_models.py --models second --batch_size 8

# 5. PointPillar batch scaling with the batched NMS (bench.py: full raw-scan
# path incl. on-device voxelize; bench_models rows: recorded to
# BENCH_MODELS.json for the B8>=B2 batched-NMS evidence, VERDICT r3 #3)
step pp-b16 env BENCH_BATCH=16 python bench.py
step pp-b8 env BENCH_BATCH=8 python bench.py
step pp-b4 env BENCH_BATCH=4 python bench.py
step pp-b2 python bench.py
step pp-rows-b2 python scripts/bench_models.py --models pointpillar_eval --batch_size 2
step pp-rows-b4 python scripts/bench_models.py --models pointpillar_eval --batch_size 4
step pp-rows-b8 python scripts/bench_models.py --models pointpillar_eval --batch_size 8

# 6. per-stage eval profile refresh (+ PointPillar carve-up)
step stages python scripts/profile_eval_stages.py \
    --models second,second_backbone,parta2,parta2_unet,pointpillar

# 7. roofline / MFU report
step roofline python scripts/roofline.py

# 8. two-stage path through the CLI (stage-2 changed in round 3: lazy
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

# 9. commit the measurement artifacts so they survive even if the session
# ends before a human-driven commit (the driver only auto-commits at round
# end; a tunnel that comes back late must not lose the numbers)
git add -A CHIP_QUEUE_LOG.txt BENCH_MODELS.json ROOFLINE.json \
    PROFILE_EVAL_STAGES.json 2>/dev/null
git -c user.name="$(git config user.name || echo chip-queue)" \
    -c user.email="$(git config user.email || echo chip-queue@local)" \
    commit -m "Chip queue: record on-chip measurement artifacts" \
    --only CHIP_QUEUE_LOG.txt BENCH_MODELS.json ROOFLINE.json \
    PROFILE_EVAL_STAGES.json 2>&1 | tail -2 | tee -a $LOG

echo "=== chip queue done $(date)" | tee -a $LOG
