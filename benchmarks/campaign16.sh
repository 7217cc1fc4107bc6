#!/bin/bash
# Round-2 (extended session) queue v2 — replaces campaign15's controller.
#
# The TPU tunnel went dark at ~23:14 UTC (every client, including a bare
# jax.devices() probe, hangs in the axon claim-retry loop).  campaign15's
# stages would each burn their full timeout waiting; this controller
# instead gates every stage on a cheap probe so stage timeouts start only
# once the tunnel answers.  Stage list and rationale: see campaign15.sh.
#
# Usage: campaign16.sh [wait_pid]   (waits for the in-flight coloring
# python to exit before taking over the chip)
set -u
cd /root/repo

if [ $# -ge 1 ] && [ -n "$1" ]; then
  echo "waiting for pid $1 to release the TPU..."
  tail --pid="$1" -f /dev/null
fi

wait_tpu() {
  # Block until a 90s jax.devices() probe succeeds (tunnel healthy).
  local n=0
  while ! timeout 90 python -c "import jax; jax.devices()" \
      > /dev/null 2>&1; do
    n=$((n + 1))
    echo "tunnel probe $n failed; retrying in 120s ($(date -u +%H:%M))"
    sleep 120
  done
  echo "tunnel healthy at $(date -u +%H:%M) after $n failed probes"
}

run() {
  name=$1; tmo=$2; shift 2
  wait_tpu
  echo "=== $name: $* ==="
  timeout "$tmo" "$@" > "/tmp/campaign16_${name}.log" 2>&1
  echo "=== $name done (exit $?) ==="
  tail -4 "/tmp/campaign16_${name}.log"
}

# Rerun coloring only if the in-flight attempt didn't finish 75k steps.
if ! grep -q '"step": 75000' runs/coloring/metrics.jsonl 2>/dev/null; then
  run coloring_75k 5400 python experiments/graph_coloring/train.py \
    --num_steps 75000 --eval_every 5000 --eval_samples 8 \
    --out_dir runs/coloring --log_every 2000 --resume
fi

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

echo "campaign16 complete"
