#!/bin/bash
# Sequential TPU quality-run campaign. Each run writes metrics to runs/<name>;
# summarise with benchmarks/summarize_runs.py afterwards.
set -u
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 2500 "$@" > "/tmp/campaign_${name}.log" 2>&1
  echo "=== $name done (exit $?) ==="
  tail -3 "/tmp/campaign_${name}.log"
}

run sum_mixture python experiments/set_summation/train.py \
  --num_steps 12000 --eval_every 2000 --eval_samples 16 --batch_size 1024 \
  --encoding mixture --out_dir runs/sum_mixture --log_every 1000

run sum_vardeq python experiments/set_summation/train.py \
  --num_steps 12000 --eval_every 2000 --eval_samples 16 --batch_size 1024 \
  --encoding vardeq --out_dir runs/sum_vardeq --log_every 1000

run lm_synth python experiments/language_modeling/train.py \
  --corpus synthetic --num_steps 8000 --eval_every 2000 --eval_samples 8 \
  --batch_size 128 --seq_len 128 --hidden_dim 256 --num_layers 2 \
  --out_dir runs/lm_synth --log_every 500

run coloring python experiments/graph_coloring/train.py \
  --num_steps 10000 --eval_every 2000 --eval_samples 8 \
  --out_dir runs/coloring --log_every 1000

run molecules python experiments/molecule_generation/train.py \
  --num_steps 8000 --eval_every 2000 --eval_samples 4 --batch_size 64 \
  --max_nodes 24 --out_dir runs/molecules --log_every 1000

echo "campaign complete"
