#!/bin/bash
# Round-1 fourth campaign: LM with channel-coupled AR flow.
set -u
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 4000 "$@" > "/tmp/campaign4_${name}.log" 2>&1
  echo "=== $name done (exit $?) ==="
  tail -3 "/tmp/campaign4_${name}.log"
}

run lm_v3 python experiments/language_modeling/train.py \
  --corpus synthetic --num_steps 30000 --eval_every 5000 --eval_samples 8 \
  --batch_size 128 --seq_len 256 --hidden_dim 512 --num_layers 2 \
  --encoding_dim 4 --num_mixtures 16 --lr 5e-4 \
  --out_dir runs/lm_v3 --log_every 2000

run molecules_v2 python experiments/molecule_generation/train.py \
  --num_steps 25000 --eval_every 5000 --eval_samples 4 --batch_size 64 \
  --max_nodes 24 --hidden_dim 128 --out_dir runs/molecules_v2 \
  --log_every 2000 --resume

echo "campaign4 complete"
