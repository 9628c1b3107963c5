#!/bin/bash
# Round-4b chip queue: the A/Bs the 2026-08-19 03:52 environment restart cut
# off (see CHIP_QUEUE_LOG.prev.txt), re-ordered by expected value under the
# ROOFLINE.json diagnosis (SECOND eval issue-bound at 5.4% MFU / 13.7% HBM:
# taller tiles and fewer kernel launches are the right levers; streaming
# tweaks are not).  Commits artifacts after every step.
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
           PROFILE_EVAL_STAGES.json; do
    [ -f "$f" ] && files+=("$f")
  done
  # Empty array under set -u errors on bash<4.4, and `git commit --only`
  # with no pathspec falls back to whatever is staged (ADVICE r4).
  [ ${#files[@]} -eq 0 ] && return 0
  git add -- "${files[@]}" 2>/dev/null
  git commit -m "Chip queue r4b: measurement artifacts ($1)" \
      --only -- "${files[@]}" 2>&1 | tail -1 | tee -a $LOG
}

# 1. tile-height sweep: the issue-bound diagnosis says TV=64 underfills;
# microbench is cheap (~8 min) and decides whether to re-run e2e at TV=128
step tv128 env PCDET_GATHER_TV=128 python scripts/exp_xwin_loads.py
step tv256 env PCDET_GATHER_TV=256 python scripts/exp_xwin_loads.py
commit_artifacts tv-sweep

# 2. dense-tail full/conv3 on SECOND (subm measured: 18.83, no win; full
# replaces the whole /8 tail + conv3 replaces the /4 subm pair — fewer
# kernel launches is exactly what an issue-bound profile wants)
step bench-b8-dtail-full env PCDET_DENSE_TAIL=full \
    python scripts/bench_models.py --models second --batch_size 8 --eval_only
step bench-b8-dtail-conv3 env PCDET_DENSE_TAIL=conv3 \
    python scripts/bench_models.py --models second --batch_size 8 --eval_only
commit_artifacts dense-tail-full

# 3. lookup backends (rulebook-build chain is part of the serial overhead)
step bench-b8-bitmap env PCDET_SPARSE_LOOKUP=bitmap \
    python scripts/bench_models.py --models second --batch_size 8 --eval_only
step bench-b8-auto env PCDET_SPARSE_LOOKUP=auto \
    python scripts/bench_models.py --models second,parta2 --batch_size 8 --eval_only
commit_artifacts lookup-backends

# 4. tile-gate A/B (measures what default-on gating buys at bench occupancy)
step bench-b8-nogate env PCDET_DISABLE_TILE_GATE=1 \
    python scripts/bench_models.py --models second --batch_size 8 --eval_only
commit_artifacts gate-ab

echo "=== chip queue r4b done $(date)" | tee -a $LOG
