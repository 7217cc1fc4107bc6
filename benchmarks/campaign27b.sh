#!/bin/bash
# Continuation of campaign27 after the mid-window perf-probe pause
# (campaign28).  Drops the completed lm + sweep stages; reprioritizes the
# tail for the remaining window: mol->100k + its 10k eval (VERDICT r2 #1)
# > moses first chunk + eval (#6, currently zero rows) > coloring3 depth
# bet (#4) > sweeps.
set -u
cd /root/repo
LOG=/tmp/campaign27
mkdir -p "$LOG"

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name: timeout $tmo start $(date -u +%H:%M:%S) ==="
  timeout -k 600 "$tmo" "$@" > "$LOG/${name}.log" 2>&1
  echo "=== $name done (exit $?) $(date -u +%H:%M:%S) ==="
  tail -3 "$LOG/${name}.log"
}

steps_done() {
  find "runs/$1" -maxdepth 2 -name 'step_*' -type d 2>/dev/null \
    | grep -E 'step_[0-9]{8}$' | sed 's/.*step_//' | sort | tail -1 \
    | sed 's/^0*//' | grep . || echo 0
}

maybe_stop() { [ -f /tmp/campaign27_stop ] && { echo "stop-file: exiting"; exit 0; } || true; }

MOL_ARGS=(python experiments/molecule_generation/train.py
  --dataset zinclike250k --data_dir data --max_nodes 24 --grad_clip 15
  --num_steps 100000 --eval_every 2500 --eval_samples 4 --batch_size 192
  --hidden_dim 256 --num_layers_node 6 --num_layers_edge 8
  --num_layers_bond 12 --num_mixtures 16 --node_cond_atoms
  --bond_cond_degree --steps_per_call 4
  --out_dir runs/molecules_v7 --log_every 1000 --resume)

COL3_ARGS=(python experiments/graph_coloring/train.py
  --num_steps 150000 --eval_every 10000 --eval_samples 8 --batch_size 256
  --hidden_dim 96 --num_layers 12 --num_mixtures 8 --encoding_dim 2
  --steps_per_call 8
  --out_dir runs/coloring3 --log_every 2000 --resume)

MOSES_ARGS=(python experiments/molecule_generation/train.py
  --dataset moseslike50k --data_dir data --max_nodes 24 --grad_clip 15
  --num_steps 30000 --eval_every 2500 --eval_samples 4 --batch_size 192
  --hidden_dim 256 --num_layers_node 6 --num_layers_edge 8
  --num_mixtures 16 --node_cond_atoms --bond_cond_degree
  --steps_per_call 4
  --out_dir runs/moses --log_every 1000 --resume)

mol_chunk() {
  if [ "$(steps_done molecules_v7)" -ge 100000 ]; then return 0; fi
  run "mol_v7_$1" 3300 "${MOL_ARGS[@]}"
  git add runs/molecules_v7 && git commit -q -m \
    "molecules_v7 $1: metrics ($(steps_done molecules_v7) steps)" \
    -- runs/molecules_v7 || true
}

col3_chunk() {
  if [ "$(steps_done coloring3)" -ge 150000 ]; then return 0; fi
  run "coloring3_$1" 3300 "${COL3_ARGS[@]}"
  git add runs/coloring3 && git commit -q -m \
    "coloring3 $1 (12-layer): metrics ($(steps_done coloring3) steps)" \
    -- runs/coloring3 || true
}

moses_chunk() {
  if [ "$(steps_done moses)" -ge 30000 ]; then return 0; fi
  run "moses_$1" 3300 "${MOSES_ARGS[@]}"
  git add runs/moses && git commit -q -m \
    "moses $1: metrics ($(steps_done moses) steps)" -- runs/moses || true
}

maybe_stop; mol_chunk r4a
maybe_stop; col3_chunk c1
maybe_stop; mol_chunk r4b
maybe_stop; mol_chunk r4c   # catch-up if needed

# molecule final eval: scalar Ts + per-stage winners from the bond sweep
maybe_stop
run mol_v7_samples10k_r4 3000 python experiments/sample_eval.py \
  --run runs/molecules_v7 --num_samples 10240 \
  --temperatures "1.0,0.85,1:1:0.7,0.85:1:0.7"
run mol_v7_diag_r4 1200 python benchmarks/molecule_diagnostics.py \
  --run runs/molecules_v7 || true
git add runs/molecules_v7 && git commit -q -m \
  "molecules_v7: 10k-sample eval @$(steps_done molecules_v7) (scalar + per-stage T)" \
  -- runs/molecules_v7 || true
bash benchmarks/ckpt_bundle.sh stash molecules_v7 2>/dev/null || true

maybe_stop; moses_chunk c1
maybe_stop; col3_chunk c2
maybe_stop; moses_chunk c2
maybe_stop
if [ "$(steps_done moses)" -gt 0 ]; then
  run moses_samples10k 3000 python experiments/sample_eval.py \
    --run runs/moses --num_samples 10240 --temperatures "1.0,0.85,1:1:0.7"
  git add runs/moses && git commit -q -m "moses: 10k-sample eval" \
    -- runs/moses || true
  bash benchmarks/ckpt_bundle.sh stash moses 2>/dev/null || true
fi

maybe_stop
run coloring3_sweep 1200 python experiments/sample_eval.py \
  --run runs/coloring3 --temperatures 1.0,0.85,0.7 --num_samples 1024 || true
git add runs/coloring3 && git commit -q -m "coloring3: temperature sweep" \
  -- runs/coloring3 || true
bash benchmarks/ckpt_bundle.sh stash coloring3 2>/dev/null || true

maybe_stop; col3_chunk c3
maybe_stop; col3_chunk c4
run coloring3_sweep2 1200 python experiments/sample_eval.py \
  --run runs/coloring3 --temperatures 1.0,0.85,0.7 --num_samples 1024 || true
git add runs/coloring3 && git commit -q -m "coloring3: temperature sweep 2" \
  -- runs/coloring3 || true
bash benchmarks/ckpt_bundle.sh stash coloring3 2>/dev/null || true

echo "campaign27b complete $(date -u +%H:%M:%S)"
