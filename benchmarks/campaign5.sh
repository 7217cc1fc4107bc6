#!/bin/bash
# Round-2 campaign: VERDICT r1 items — molecules to high raw validity with
# the stage-3 sampling-mask fix (resume from 25k), coloring >90% validity,
# LM gap closure, and the full encoding ablation grid on set shuffling
# (mixture already at 2.7771; vardeq + linear-flows here).
set -u
cd /root/repo

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name: $* ==="
  timeout "$tmo" "$@" > "/tmp/campaign5_${name}.log" 2>&1
  echo "=== $name done (exit $?) ==="
  tail -4 "/tmp/campaign5_${name}.log"
}

# 1. molecules: continue the (valid-density) 25k run to 60k steps; the
#    sampling-mask fix applies at eval/sample time.
run molecules_v2_60k 5400 python experiments/molecule_generation/train.py \
  --num_steps 60000 --eval_every 5000 --eval_samples 4 --batch_size 64 \
  --max_nodes 24 --hidden_dim 128 --out_dir runs/molecules_v2 \
  --log_every 2000 --resume

# 2. coloring: continue 25k -> 75k
run coloring_75k 5400 python experiments/graph_coloring/train.py \
  --num_steps 75000 --eval_every 5000 --eval_samples 8 \
  --out_dir runs/coloring --log_every 2000 --resume

# 3. LM: deeper flow (3 scanned blocks), 50k steps
run lm_v4 7000 python experiments/language_modeling/train.py \
  --corpus synthetic --num_steps 50000 --eval_every 5000 --eval_samples 8 \
  --batch_size 128 --seq_len 256 --hidden_dim 512 --num_layers 3 \
  --encoding_dim 4 --num_mixtures 16 --lr 5e-4 \
  --out_dir runs/lm_v4 --log_every 2000

# 4-5. encoding ablations on set shuffling (BASELINE row 2)
run shuffle_vardeq 4200 python experiments/set_shuffling/train.py \
  --num_steps 40000 --eval_every 5000 --eval_samples 16 --batch_size 1024 \
  --encoding vardeq --out_dir runs/shuffle_vardeq --log_every 2000

run shuffle_linear 4200 python experiments/set_shuffling/train.py \
  --num_steps 40000 --eval_every 5000 --eval_samples 16 --batch_size 1024 \
  --encoding linear_flows --out_dir runs/shuffle_linear --log_every 2000

echo "campaign5 complete"
