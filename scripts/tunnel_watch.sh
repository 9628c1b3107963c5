#!/bin/bash
# Poll the axon TPU tunnel; when it answers, run the chip-work queue.
# Each probe is timeout-bounded so a down tunnel never wedges a client.
set -u
cd "$(dirname "$0")/.."
echo "tunnel watch started $(date)"
while true; do
  if timeout 90 python -c "import jax; print(jax.devices())" >/dev/null 2>&1; then
    echo "tunnel is UP $(date) — starting chip queue"
    bash scripts/chip_queue.sh
    exit $?
  fi
  echo "tunnel still down $(date)"
  sleep 240
done
