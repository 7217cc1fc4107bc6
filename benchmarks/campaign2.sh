#!/bin/bash
# Round-1 second campaign: longer runs to close quality gaps.
set -u
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 4000 "$@" > "/tmp/campaign2_${name}.log" 2>&1
  echo "=== $name done (exit $?) ==="
  tail -3 "/tmp/campaign2_${name}.log"
}

# continue set shuffling from the 20k checkpoint
run set16_resume python experiments/set_shuffling/train.py \
  --num_steps 60000 --eval_every 5000 --eval_samples 16 --batch_size 1024 \
  --out_dir runs/set16 --log_every 2000 --resume

run lm_long python experiments/language_modeling/train.py \
  --corpus synthetic --num_steps 30000 --eval_every 5000 --eval_samples 8 \
  --batch_size 128 --seq_len 256 --hidden_dim 512 --num_layers 2 \
  --lr 5e-4 --out_dir runs/lm_long --log_every 2000

run molecules_long python experiments/molecule_generation/train.py \
  --num_steps 25000 --eval_every 5000 --eval_samples 4 --batch_size 64 \
  --max_nodes 24 --hidden_dim 128 --out_dir runs/molecules_long \
  --log_every 2000

run coloring_resume python experiments/graph_coloring/train.py \
  --num_steps 25000 --eval_every 5000 --eval_samples 8 \
  --out_dir runs/coloring --log_every 2000 --resume

echo "campaign2 complete"
