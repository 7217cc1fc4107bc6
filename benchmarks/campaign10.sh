#!/bin/bash
# Round-2 post-campaign evaluation queue: runs after campaign9 frees the
# chip.  No training — only post-hoc measurement of the finished runs:
#
#   1. lm_v4 / lm_v5_tf at IS-128 (tightest honest IW bound; the in-run
#      test() uses IS-32).  The IW bound is monotone in the sample count,
#      so these can only tighten the reported bpd (VERDICT r1 #2).
#   2. molecules_v5 sample metrics at 1024 samples with the
#      reference-comparable (valence-only) + strict validity split and a
#      temperature sweep (VERDICT r1 #1/#6).
#   3. coloring validity on 1024 samples post-75k-steps.
#
# Usage: campaign10.sh [wait_pid]
set -u
cd /root/repo

if [ $# -ge 1 ] && [ -n "$1" ]; then
  echo "waiting for pid $1 to release the TPU..."
  tail --pid="$1" -f /dev/null
fi

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name: $* ==="
  timeout "$tmo" "$@" > "/tmp/campaign10_${name}.log" 2>&1
  echo "=== $name done (exit $?) ==="
  tail -4 "/tmp/campaign10_${name}.log"
}

run lm_v4_is128 2400 python experiments/eval_bpd.py \
  --run runs/lm_v4 --num_samples 128 --split test

run lm_v5_tf_is128 2400 python experiments/eval_bpd.py \
  --run runs/lm_v5_tf --num_samples 128 --split test

run molecules_v5_samples 3600 python experiments/sample_eval.py \
  --run runs/molecules_v5 --temperatures 1.0,0.85,0.7 --num_samples 1024

run coloring_samples 2400 python experiments/sample_eval.py \
  --run runs/coloring --temperatures 1.0 --num_samples 1024

echo "campaign10 complete"
