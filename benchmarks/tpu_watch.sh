#!/bin/bash
# Watch for the axon TPU tunnel to return, then drain the round-4
# measurement queue (benchmarks/tpu_queue.sh).  Probes with a hard
# timeout because a down tunnel makes jax.devices() hang forever
# (see memory: sitecustomize registers the axon PJRT plugin at boot).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_watch.log}
QUEUE_LOG=${2:-/tmp/tpu_queue_r4.log}

echo "== watch start $(date) ==" | tee -a "$LOG"
while true; do
  if timeout -k 10 90 python -c "import jax; d = jax.devices(); print(d); assert d[0].platform != 'cpu', 'cpu fallback is not a live tunnel'" >>"$LOG" 2>&1; then
    echo "tunnel UP at $(date); draining queue" | tee -a "$LOG"
    bash benchmarks/tpu_queue.sh "$QUEUE_LOG"
    echo "queue finished at $(date)" | tee -a "$LOG"
    exit 0
  fi
  echo "tunnel down at $(date); retry in 240s" >>"$LOG"
  sleep 240
done
