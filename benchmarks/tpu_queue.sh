#!/bin/bash
# Round-4 hardware measurement queue (run on the tunneled TPU).
#
# The axon tunnel went down mid-round-4 (after the code landed, before
# its measurements); this script drains every pending measurement from
# VERDICT_RESPONSE.md in priority order the moment the tunnel returns:
#
#   1. headline bench + the PRNG/compaction A/B matrix (verdict item 1)
#   2. PRNG contract-v2 lab: invariance, microbench, stat parity
#   3. QC node-sharded per-shard compute vs single chip (item 2)
#   4. layered schedule A/B incl. layered+compaction (schedule family)
#   5. privacy-amplification 262k block-Toeplitz lab (item 4)
#   6. serving chained-slope device latencies (item 8 part 2)
#   7. reference-profile QC point: parity sweep + bench (item 7)
#   8. final default bench to leave the compile cache warm for the
#      driver's BENCH_r04 run (memory: fresh compiles over the tunnel
#      take 10-40 min; ALWAYS re-warm after DecodeOptions changes)
#
# Usage: bash benchmarks/tpu_queue.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_queue_r4.log}

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >>"$LOG" 2>&1
  echo "--- $name exit $? ($(date +%H:%M:%S)) ---" | tee -a "$LOG"
}

echo "== queue start $(date) ==" | tee -a "$LOG"
if ! timeout 90 python -c "import jax; d = jax.devices(); print(d); assert d[0].platform != 'cpu', 'cpu fallback is not a live tunnel'" >>"$LOG" 2>&1; then
  echo "tunnel still down; aborting" | tee -a "$LOG"
  exit 1
fi

# 1. headline (defaults: QC flagship, pallas PRNG, compact=8) + A/B matrix.
#    Interleaving guards against chip drift for close calls; the matrix
#    legs rerun the same program shapes so cache stays warm.
run bench-default      3600 python bench.py
run bench-threefry     3600 env BENCH_PRNG=threefry python bench.py
run bench-nocompact    3600 env BENCH_COMPACT=0 python bench.py
run bench-neither      3600 env BENCH_PRNG=threefry BENCH_COMPACT=0 python bench.py
run bench-default-2    1800 python bench.py

# 2. PRNG determinism-contract v2 evidence.
run prng_lab           3600 python benchmarks/prng_lab.py

# 3. QC node-sharded per-shard compute (target <=1.5x single-chip).
run qc_nodeshard       3600 python benchmarks/qc_nodeshard_compute.py

# 4. layered vs flooding (+ layered+compaction e2e leg).  On TPU the
#    layered schedule now resolves to the fused one-sweep Pallas kernel
#    (decoder/pallas_layered, round 5); the -xla leg pins the round-4
#    XLA lowering so the A/B separates schedule gain from kernel gain.
run layered            3600 python benchmarks/layered.py
run bench-layered      3600 env BENCH_SCHEDULE=layered python bench.py
run bench-layered-xla  3600 env BENCH_SCHEDULE=layered BENCH_BACKEND=xla python bench.py

# 5. amplification: block-Toeplitz at 262k (target <=~100 ms / 32 frames).
run amplify_lab        3600 python benchmarks/amplify_lab.py

# 6. serving chained-slope device latencies (+ layered-schedule leg:
#    fewer sweeps -> lower tail latency is the hypothesis to test).
run serving            3600 python benchmarks/serving.py --qc
run serving-layered    3600 python benchmarks/serving.py --qc --schedule layered

# 7. reference-profile QC point (z=128, nb=80, mb=41, R=0.4875).
run qcref_bench        3600 env BENCH_CODE=qc-ref python bench.py
run qcref_parity       14400 python tests/parity_sweep.py --code qc-ref --trials 5000

# 8. leave the cache warm on the shipping configuration.
run bench-final        1800 python bench.py

# 9. opportunistic (lowest priority): compaction-point tuning around the
#    shipped k=8 — only reached if everything above drained.
run bench-compact4     3600 env BENCH_COMPACT=4 python bench.py
run bench-compact12    3600 env BENCH_COMPACT=12 python bench.py
run bench-rewarm       1800 python bench.py

echo "== queue done $(date) ==" | tee -a "$LOG"
