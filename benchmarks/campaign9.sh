#!/bin/bash
# Round-2 campaign (v5, supersedes campaign8): after the campaign7 queue
# (lm_v4 resume, set-shuffling encoding ablations, coloring 75k), run the
# two remaining priority stages in VERDICT order:
#
#   1. molecules_v5 — the scaled-up GraphCNF on the 250k-molecule
#      structured dataset.  Diagnosis on v4's mid-run checkpoint
#      (/tmp/mol_diag2): ~1 isolated atom + ~1 valence-excess atom per
#      sampled molecule, i.e. the edge-existence stage's per-node degree
#      distribution is too diffuse — a capacity/training-scale gap, not a
#      masking bug (temperature sweep at 0.5/0.7/0.85 moved validity only
#      9%->11%).  Scale model (hidden 256, 6 node + 8 edge layers, K=16)
#      and data (250k mols ~ Zinc250k scale, so ~100 epochs instead of
#      500+ at these step counts).
#   2. lm_v5_tf — transformer-backbone LM (scan-free causal attention).
#
# Usage: campaign9.sh [wait_pid]
set -u
cd /root/repo

if [ $# -ge 1 ] && [ -n "$1" ]; then
  echo "waiting for pid $1 to release the TPU..."
  tail --pid="$1" -f /dev/null
fi

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name: $* ==="
  timeout "$tmo" "$@" > "/tmp/campaign9_${name}.log" 2>&1
  echo "=== $name done (exit $?) ==="
  tail -4 "/tmp/campaign9_${name}.log"
}

run molecules_v5 10800 python experiments/molecule_generation/train.py \
  --dataset zinclike250k --data_dir data --max_nodes 24 \
  --num_steps 120000 --eval_every 10000 --eval_samples 4 --batch_size 192 \
  --hidden_dim 256 --num_layers_node 6 --num_layers_edge 8 \
  --num_mixtures 16 --out_dir runs/molecules_v5 --log_every 2000

run lm_v5_tf 7200 python experiments/language_modeling/train.py \
  --corpus synthetic --net transformer --num_steps 50000 --eval_every 5000 \
  --eval_samples 8 --batch_size 128 --seq_len 256 --hidden_dim 384 \
  --lstm_layers 2 --num_layers 3 --encoding_dim 4 --num_mixtures 16 \
  --lr 5e-4 --out_dir runs/lm_v5_tf --log_every 2000

echo "campaign9 complete"
