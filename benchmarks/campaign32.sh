#!/bin/bash
# Round-5 perf queue — runs AFTER campaign31 (quality) drains.  Attacks
# VERDICT r4 #3b/#4: the sampling-throughput story and the 2x gap to the
# HBM roofline on the train step.
#
# Stages (all forced-sync, one TPU process at a time):
#   1. sampling_bench: ancestral-sampling samples/s (set/coloring/GraphCNF)
#   2. lm_bench: train/eval/sample tokens/s (re-measurement owed since r3)
#   3. bench.py B-sweep {1024,1536,2048,3072} at K=8 remat=1
#   4. bench.py unroll sweep {2,4} at the winning B
#   5. final bench.py at the best config found (recorded for BENCH_r05)
set -u
cd /root/repo
LOG=/tmp/campaign32
mkdir -p "$LOG"
WAIT_PID=${1:-}

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name: timeout $tmo start $(date -u +%H:%M:%S) ==="
  timeout -k 300 "$tmo" "$@" > "$LOG/${name}.log" 2>&1
  echo "=== $name done (exit $?) $(date -u +%H:%M:%S) ==="
  tail -4 "$LOG/${name}.log"
}
maybe_stop() { [ -f /tmp/campaign32_stop ] && { echo "stop-file: exiting"; exit 0; } || true; }

if [ -n "$WAIT_PID" ]; then
  echo "waiting on campaign31 pid $WAIT_PID ..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
echo "campaign31 drained; perf stages start $(date -u +%H:%M:%S)"

maybe_stop
# kernel_bench crashed at campaign31's tail on a missing sys.path header
# (it had only ever run under an explicit PYTHONPATH); re-run it first —
# the honest Pallas-vs-XLA numbers are the top perf deliverable.
run kernel_bench 2400 python benchmarks/kernel_bench.py
maybe_stop
run sampling_bench 3600 python benchmarks/sampling_bench.py \
  --iters 8 --json "$LOG/sampling_bench.jsonl"
maybe_stop
run lm_bench 3000 python benchmarks/lm_bench.py
maybe_stop
# KV-cache sampling path (causal transformer backbone) — the VERDICT r4
# #4 "LM sampling tokens/s via the KV-cache path" row
run lm_bench_kv 3000 python benchmarks/lm_bench.py --net transformer
maybe_stop
for B in 1024 1536 2048 3072; do
  maybe_stop
  run "bench_B$B" 1800 env CNF_BENCH_BATCH=$B python bench.py
done
for U in 2 4; do
  maybe_stop
  run "bench_unroll$U" 1800 env CNF_BENCH_UNROLL=$U python bench.py
done
maybe_stop
run profile_step 2400 python benchmarks/profile_step.py \
  --out /tmp/campaign32/trace
echo "campaign32 complete $(date -u +%H:%M:%S)"
