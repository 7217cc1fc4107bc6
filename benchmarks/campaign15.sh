#!/bin/bash
# Round-2 (extended session) queue, supersedes campaign13/14 (controllers
# killed 00:00 UTC Aug 18 after the coloring resume tunnel-stalled at
# startup: futex-wait, 15s CPU over 46 min, no metrics growth).
#
# Priority order (VERDICT r1 items first):
#   1. coloring 75k resume retry + 1024-sample validity   (VERDICT #5)
#   2. molecules_v5 resume 20k -> 120k + 1024-sample sweep (VERDICT #1)
#   3. lm_v6: 3-block LSTM-512 on the 20M-char corpus      (VERDICT #2)
#   4. lm_v6 IS-128 post-hoc test bound
#   5. lm_v5_tf transformer backbone + IS-128
#   6. lm_bench re-measures (post-sync-fix numbers)
#
# Every stage checkpoints; preemption loses nothing. Kill by exact PID only.
set -u
cd /root/repo

sleep 180   # let the tunnel settle after the stall-kill

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name: $* ==="
  timeout "$tmo" "$@" > "/tmp/campaign15_${name}.log" 2>&1
  echo "=== $name done (exit $?) ==="
  tail -4 "/tmp/campaign15_${name}.log"
}

run coloring_75k 5400 python experiments/graph_coloring/train.py \
  --num_steps 75000 --eval_every 5000 --eval_samples 8 \
  --out_dir runs/coloring --log_every 2000 --resume

run coloring_samples 2400 python experiments/sample_eval.py \
  --run runs/coloring --temperatures 1.0 --num_samples 1024

run molecules_v5_120k 23400 python experiments/molecule_generation/train.py \
  --dataset zinclike250k --data_dir data --max_nodes 24 \
  --num_steps 120000 --eval_every 10000 --eval_samples 4 --batch_size 192 \
  --hidden_dim 256 --num_layers_node 6 --num_layers_edge 8 \
  --num_mixtures 16 --out_dir runs/molecules_v5 --log_every 2000 --resume

run molecules_v5_samples2 4200 python experiments/sample_eval.py \
  --run runs/molecules_v5 --temperatures 1.0,0.85,0.7 --num_samples 1024

run lm_v6 12000 python experiments/language_modeling/train.py \
  --corpus synthetic --num_steps 50000 --eval_every 5000 --eval_samples 8 \
  --batch_size 128 --seq_len 256 --hidden_dim 512 --num_layers 3 \
  --encoding_dim 4 --num_mixtures 16 --lr 5e-4 \
  --out_dir runs/lm_v6 --log_every 2000

run lm_v6_is128 3600 python experiments/eval_bpd.py \
  --run runs/lm_v6 --num_samples 128 --split test

run lm_v5_tf 9000 python experiments/language_modeling/train.py \
  --corpus synthetic --net transformer --num_steps 50000 --eval_every 5000 \
  --eval_samples 8 --batch_size 128 --seq_len 256 --hidden_dim 384 \
  --lstm_layers 2 --num_layers 3 --encoding_dim 4 --num_mixtures 16 \
  --lr 5e-4 --out_dir runs/lm_v5_tf --log_every 2000

run lm_v5_tf_is128 3600 python experiments/eval_bpd.py \
  --run runs/lm_v5_tf --num_samples 128 --split test

run lm_v4_is128 3600 python experiments/eval_bpd.py \
  --run runs/lm_v4 --num_samples 128 --split test

run lm_bench_lstm 2400 python benchmarks/lm_bench.py --net lstm

run lm_bench_tf 2400 python benchmarks/lm_bench.py --net transformer

echo "campaign15 complete"
