#!/bin/bash
# Overnight continuation queue (runs after campaign13, i.e. mostly in the
# round-2/3 boundary hours when the chip would otherwise idle):
#
#   1. molecules_v5 resume 30k -> 120k steps (VERDICT #1: drive
#      reference-comparable validity toward 83%); ~4h at the measured
#      6 steps/s, periodic checkpoints throughout.
#   2. Post-resume 1024-sample dual-validity temperature sweep.
#   3. lm_v6: the lm_v4 architecture (3-block LSTM-512) on the enlarged
#      20M-char corpus — lm_v4 hit best 3.6047 at 15k then memorized the
#      old 2M-char corpus; with 10x data the same capacity should close
#      toward the 3.4506 entropy rate (VERDICT #2).
#   4. lm_v6 IS-128 post-hoc test bound.
#
# Round 3 may kill this controller (exact PID) and requeue per its own
# plan; every stage checkpoints, so nothing is lost by preemption.
#
# Usage: campaign14.sh [wait_pid]
set -u
cd /root/repo

if [ $# -ge 1 ] && [ -n "$1" ]; then
  echo "waiting for pid $1 to release the TPU..."
  tail --pid="$1" -f /dev/null
fi

guard() {
  now=$(date -u +%H%M)
  if [ "$now" -ge 2350 ] || [ "$now" -lt 0045 ]; then
    echo "round-boundary guard: holding next stage until 00:45 UTC"
    while [ "$(date -u +%H%M)" -ge 2350 ] || [ "$(date -u +%H%M)" -lt 0045 ]; do
      sleep 60
    done
  fi
}

run() {
  name=$1; tmo=$2; shift 2
  guard
  echo "=== $name: $* ==="
  timeout "$tmo" "$@" > "/tmp/campaign14_${name}.log" 2>&1
  echo "=== $name done (exit $?) ==="
  tail -4 "/tmp/campaign14_${name}.log"
}

run molecules_v5_120k 21600 python experiments/molecule_generation/train.py \
  --dataset zinclike250k --data_dir data --max_nodes 24 \
  --num_steps 120000 --eval_every 10000 --eval_samples 4 --batch_size 192 \
  --hidden_dim 256 --num_layers_node 6 --num_layers_edge 8 \
  --num_mixtures 16 --out_dir runs/molecules_v5 --log_every 2000 --resume

run molecules_v5_samples2 3600 python experiments/sample_eval.py \
  --run runs/molecules_v5 --temperatures 1.0,0.85,0.7 --num_samples 1024

run lm_v6 9000 python experiments/language_modeling/train.py \
  --corpus synthetic --num_steps 50000 --eval_every 5000 --eval_samples 8 \
  --batch_size 128 --seq_len 256 --hidden_dim 512 --num_layers 3 \
  --encoding_dim 4 --num_mixtures 16 --lr 5e-4 \
  --out_dir runs/lm_v6 --log_every 2000

run lm_v6_is128 3600 python experiments/eval_bpd.py \
  --run runs/lm_v6 --num_samples 128 --split test

echo "campaign14 complete"
