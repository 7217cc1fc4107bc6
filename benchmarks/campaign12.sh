#!/bin/bash
# Post-campaign11 retries and re-measurements:
#   1. lm_v4 IS-128 post-hoc test bound — the first attempt OOM'd (flat
#      vmap over 128 IS chains wanted a 32 GB intermediate); iw_log_prob
#      now chunks chains via lax.map.
#   2. lm_bench re-measurement with the compute-floor impossibility
#      check (the r1 36M tokens/s figure was an async artifact).
#
# Usage: campaign12.sh [wait_pid]
set -u
cd /root/repo

if [ $# -ge 1 ] && [ -n "$1" ]; then
  echo "waiting for pid $1 to release the TPU..."
  tail --pid="$1" -f /dev/null
fi

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name: $* ==="
  timeout "$tmo" "$@" > "/tmp/campaign12_${name}.log" 2>&1
  echo "=== $name done (exit $?) ==="
  tail -4 "/tmp/campaign12_${name}.log"
}

run lm_v4_is128 3600 python experiments/eval_bpd.py \
  --run runs/lm_v4 --num_samples 128 --split test

run lm_bench_lstm 2400 python benchmarks/lm_bench.py --net lstm

run lm_bench_tf 2400 python benchmarks/lm_bench.py --net transformer

echo "campaign12 complete"
