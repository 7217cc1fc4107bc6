#!/bin/bash
# Round-2 queue v3 (supersedes the tails of campaign11 + campaign12):
# molecules_v5 is rerun with rematerialized ScannedBlocks after the
# original launch OOM'd (31G needed vs 15.75G HBM; train-step activations
# are now recomputed in backward).  Step count trimmed to 30k so the
# final 1024-sample metrics land before the round boundary; round 3
# resumes toward 120k.  Then the displaced stages in priority order.
#
# Usage: campaign13.sh [wait_pid]  (waits for shuffle_vardeq's python)
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
  timeout "$tmo" "$@" > "/tmp/campaign13_${name}.log" 2>&1
  echo "=== $name done (exit $?) ==="
  tail -4 "/tmp/campaign13_${name}.log"
}

run molecules_v5 10800 python experiments/molecule_generation/train.py \
  --dataset zinclike250k --data_dir data --max_nodes 24 \
  --num_steps 30000 --eval_every 5000 --eval_samples 4 --batch_size 192 \
  --hidden_dim 256 --num_layers_node 6 --num_layers_edge 8 \
  --num_mixtures 16 --out_dir runs/molecules_v5 --log_every 2000

run molecules_v5_samples 3600 python experiments/sample_eval.py \
  --run runs/molecules_v5 --temperatures 1.0,0.85,0.7 --num_samples 1024

run shuffle_linear 4200 python experiments/set_shuffling/train.py \
  --num_steps 40000 --eval_every 5000 --eval_samples 16 --batch_size 1024 \
  --encoding linear_flows --out_dir runs/shuffle_linear --log_every 2000

run coloring_75k 5400 python experiments/graph_coloring/train.py \
  --num_steps 75000 --eval_every 5000 --eval_samples 8 \
  --out_dir runs/coloring --log_every 2000 --resume

run lm_v5_tf 7200 python experiments/language_modeling/train.py \
  --corpus synthetic --net transformer --num_steps 50000 --eval_every 5000 \
  --eval_samples 8 --batch_size 128 --seq_len 256 --hidden_dim 384 \
  --lstm_layers 2 --num_layers 3 --encoding_dim 4 --num_mixtures 16 \
  --lr 5e-4 --out_dir runs/lm_v5_tf --log_every 2000

run lm_v4_is128 3600 python experiments/eval_bpd.py \
  --run runs/lm_v4 --num_samples 128 --split test

run lm_v5_tf_is128 3600 python experiments/eval_bpd.py \
  --run runs/lm_v5_tf --num_samples 128 --split test

run coloring_samples 2400 python experiments/sample_eval.py \
  --run runs/coloring --temperatures 1.0 --num_samples 1024

run lm_bench_lstm 2400 python benchmarks/lm_bench.py --net lstm

run lm_bench_tf 2400 python benchmarks/lm_bench.py --net transformer

echo "campaign13 complete"
