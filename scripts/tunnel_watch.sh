#!/bin/bash
# Poll the axon TPU tunnel; when it answers, run the chip-work queue.
# Each probe is timeout-bounded so a down tunnel never wedges a client.
# If the tunnel flaps mid-queue (steps fail fast on a dead link), resume
# polling and re-run the queue — compile caches make re-runs cheap, and
# bench/profile steps overwrite their result files idempotently.
set -u
cd "$(dirname "$0")/.."
echo "tunnel watch started $(date)"
while true; do
  if timeout 90 python -c "import jax; print(jax.devices())" >/dev/null 2>&1; then
    echo "tunnel is UP $(date) — starting chip queue"
    bash scripts/chip_queue.sh
    if grep -q "=== chip queue done" CHIP_QUEUE_LOG.txt 2>/dev/null; then
      echo "chip queue completed $(date) — watcher exiting"
      exit 0
    fi
    echo "chip queue did not finish (tunnel flap?) $(date) — will retry"
  else
    echo "tunnel still down $(date)"
  fi
  sleep 240
done
