#!/bin/bash
# Round-2 campaign (v2, supersedes campaign5): VERDICT r1 items with the
# molecule fix re-scoped after diagnosis — the stage-3 mask fix was
# necessary but raw validity was data-limited (2048-sample synthetic set,
# 780 epochs = memorization): retrain on a materialized 50k-molecule
# dataset (data/synth50k.npz, preprocess.py --synthetic) with a bigger
# GraphCNF.  Stages are run individually in the session so results gate
# the next stage; this script records the exact commands.
set -u
cd /root/repo

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name: $* ==="
  timeout "$tmo" "$@" > "/tmp/campaign6_${name}.log" 2>&1
  echo "=== $name done (exit $?) ==="
  tail -4 "/tmp/campaign6_${name}.log"
}

# 1. molecules: 50k-mol dataset, hidden 192, 4+6 layers, 60k steps
run molecules_v3 7200 python experiments/molecule_generation/train.py \
  --dataset synth50k --data_dir data --max_nodes 24 \
  --num_steps 60000 --eval_every 5000 --eval_samples 4 --batch_size 128 \
  --hidden_dim 192 --num_layers_node 4 --num_layers_edge 6 \
  --out_dir runs/molecules_v3 --log_every 2000

# 2. LM: deeper flow (3 scanned blocks), 50k steps
run lm_v4 9000 python experiments/language_modeling/train.py \
  --corpus synthetic --num_steps 50000 --eval_every 5000 --eval_samples 8 \
  --batch_size 128 --seq_len 256 --hidden_dim 512 --num_layers 3 \
  --encoding_dim 4 --num_mixtures 16 --lr 5e-4 \
  --out_dir runs/lm_v4 --log_every 2000

# 3. coloring: continue 25k -> 75k
run coloring_75k 5400 python experiments/graph_coloring/train.py \
  --num_steps 75000 --eval_every 5000 --eval_samples 8 \
  --out_dir runs/coloring --log_every 2000 --resume

# 4-5. encoding ablations on set shuffling (BASELINE row 2)
run shuffle_vardeq 4200 python experiments/set_shuffling/train.py \
  --num_steps 40000 --eval_every 5000 --eval_samples 16 --batch_size 1024 \
  --encoding vardeq --out_dir runs/shuffle_vardeq --log_every 2000

run shuffle_linear 4200 python experiments/set_shuffling/train.py \
  --num_steps 40000 --eval_every 5000 --eval_samples 16 --batch_size 1024 \
  --encoding linear_flows --out_dir runs/shuffle_linear --log_every 2000

echo "campaign6 complete"
