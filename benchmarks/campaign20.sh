#!/bin/bash
# Round-2, fourth window (~1h, started 22:11 UTC Aug 18).  The third
# window finished coloring 75k (+ temp sweep) but molecules_v6 / lm_v6
# never got TPU time.  This window is short, so it goes all-in on the
# judge's top_next: a fresh molecules_v6 with the seed-replicated lever
# pair (node_cond_atoms + bond_cond_degree), ending with the 1024-sample
# temperature sweep that makes the run quotable (post-hoc sample_eval is
# mandatory: a timeout kills train.py before its own final metrics).
# The HMM-prior LM run stays parked: the CPU A/B (runs_ab/lm_prior_*)
# is still inconclusive (HMM arm reached step 500 of 2000), so no TPU
# time is spent on an unvalidated lever.
set -u
cd /root/repo

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name: timeout $tmo $(date -u +%H:%M) ==="
  timeout -k 600 "$tmo" "$@" > "/tmp/campaign20_${name}.log" 2>&1
  echo "=== $name done (exit $?) $(date -u +%H:%M) ==="
  tail -3 "/tmp/campaign20_${name}.log"
}

# Dataset must exist (workspace reset wipes data/): wait for the
# regeneration launched alongside this script.
while [ ! -f data/zinclike250k.npz ]; do sleep 5; done

run molecules_v6 1500 \
  python experiments/molecule_generation/train.py \
  --dataset zinclike250k --data_dir data --max_nodes 24 \
  --num_steps 100000 --eval_every 2500 --eval_samples 4 --batch_size 192 \
  --hidden_dim 256 --num_layers_node 6 --num_layers_edge 8 \
  --num_mixtures 16 --node_cond_atoms --bond_cond_degree \
  --out_dir runs/molecules_v6 --log_every 1000 --resume

run molecules_v6_samples 720 python experiments/sample_eval.py \
  --run runs/molecules_v6 --temperatures 1.0,0.85,0.7 --num_samples 1024

run molecules_v6_diag 420 python benchmarks/molecule_diagnostics.py \
  --run runs/molecules_v6 --num_samples 128

echo "campaign20 complete"
