#!/bin/bash
# Round-2 queue restructure (supersedes the tails of campaign7 + campaign9
# + campaign10): with ~5h left in the round, molecules_v5 (VERDICT r1 #1,
# the top priority) must start right after lm_v4 instead of ~23:30, or it
# gets ~30 min of training before the round ends.  New order:
#
#   1. lm_v4 IS-128 post-hoc test bound (tightest honest IW bound,
#      VERDICT #2 measurement; ~0.5h)
#   2. molecules_v5 at 45k steps — sized to FINISH in-round so the final
#      1024-sample dual-validity metrics + IS-32 test land in runs/;
#      round 3 resumes it toward 120k (periodic checkpoints + --resume)
#   3. the displaced stages, in prior order: shuffle_vardeq,
#      shuffle_linear, coloring 75k, lm_v5_tf, then the campaign10
#      post-hoc evals — these run as far as the round allows and
#      continue/requeue next round.
#
# Usage: campaign11.sh [wait_pid]  (waits for the lm_v4 python, PID 1028)
set -u
cd /root/repo

if [ $# -ge 1 ] && [ -n "$1" ]; then
  echo "waiting for pid $1 to release the TPU..."
  tail --pid="$1" -f /dev/null
fi

# The driver runs its round-end bench.py on the real chip at ~00:08 UTC
# (wall_s arithmetic from PROGRESS.jsonl); a campaign stage holding the
# tunnel then would contend with it.  Stages that would LAUNCH inside the
# [23:50, 00:45] window wait until 00:45 instead (running stages are
# left alone — never kill a TPU process mid-compile).
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
  timeout "$tmo" "$@" > "/tmp/campaign11_${name}.log" 2>&1
  echo "=== $name done (exit $?) ==="
  tail -4 "/tmp/campaign11_${name}.log"
}

run lm_v4_is128 2700 python experiments/eval_bpd.py \
  --run runs/lm_v4 --num_samples 128 --split test

run molecules_v5 12600 python experiments/molecule_generation/train.py \
  --dataset zinclike250k --data_dir data --max_nodes 24 \
  --num_steps 45000 --eval_every 5000 --eval_samples 4 --batch_size 192 \
  --hidden_dim 256 --num_layers_node 6 --num_layers_edge 8 \
  --num_mixtures 16 --out_dir runs/molecules_v5 --log_every 2000

run molecules_v5_samples 3600 python experiments/sample_eval.py \
  --run runs/molecules_v5 --temperatures 1.0,0.85,0.7 --num_samples 1024

run shuffle_vardeq 4200 python experiments/set_shuffling/train.py \
  --num_steps 40000 --eval_every 5000 --eval_samples 16 --batch_size 1024 \
  --encoding vardeq --out_dir runs/shuffle_vardeq --log_every 2000

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

run lm_v5_tf_is128 2700 python experiments/eval_bpd.py \
  --run runs/lm_v5_tf --num_samples 128 --split test

run coloring_samples 2400 python experiments/sample_eval.py \
  --run runs/coloring --temperatures 1.0 --num_samples 1024

echo "campaign11 complete"
