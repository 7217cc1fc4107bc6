#!/bin/bash
# Round-2 campaign (v3): serialized TPU queue for the remaining VERDICT r1
# items, run after the molecules_v4 retrain (structured zinclike50k data)
# frees the chip.  One TPU process at a time; each stage is independent of
# the molecule outcome so the queue is safe to run unattended.
#
#   1. lm_v4: resume the deeper (3-block) LM flow to 50k steps (VERDICT #2)
#   2. shuffle_vardeq / shuffle_linear: complete the encoding ablation grid
#      on set shuffling (VERDICT #4, BASELINE row 2)
#   3. coloring: continue 25k -> 75k steps (VERDICT #5)
#
# Usage: campaign7.sh [wait_pid] — waits for that PID to exit first.
set -u
cd /root/repo

if [ $# -ge 1 ] && [ -n "$1" ]; then
  echo "waiting for pid $1 to release the TPU..."
  tail --pid="$1" -f /dev/null
fi

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name: $* ==="
  timeout "$tmo" "$@" > "/tmp/campaign7_${name}.log" 2>&1
  echo "=== $name done (exit $?) ==="
  tail -4 "/tmp/campaign7_${name}.log"
}

run lm_v4 9000 python experiments/language_modeling/train.py \
  --corpus synthetic --num_steps 50000 --eval_every 5000 --eval_samples 8 \
  --batch_size 128 --seq_len 256 --hidden_dim 512 --num_layers 3 \
  --encoding_dim 4 --num_mixtures 16 --lr 5e-4 \
  --out_dir runs/lm_v4 --log_every 2000 --resume

run shuffle_vardeq 4200 python experiments/set_shuffling/train.py \
  --num_steps 40000 --eval_every 5000 --eval_samples 16 --batch_size 1024 \
  --encoding vardeq --out_dir runs/shuffle_vardeq --log_every 2000

run shuffle_linear 4200 python experiments/set_shuffling/train.py \
  --num_steps 40000 --eval_every 5000 --eval_samples 16 --batch_size 1024 \
  --encoding linear_flows --out_dir runs/shuffle_linear --log_every 2000

run coloring_75k 5400 python experiments/graph_coloring/train.py \
  --num_steps 75000 --eval_every 5000 --eval_samples 8 \
  --out_dir runs/coloring --log_every 2000 --resume

echo "campaign7 complete"
