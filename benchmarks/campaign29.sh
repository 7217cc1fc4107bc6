#!/bin/bash
# Round-4 window 2 (fresh machine: ~/.cache wiped, bundles restored from
# persist/).  Priorities from VERDICT r2 + ROUND4.md:
#   1. perf probes: fused-extract kernel vs the remat default (decides the
#      bench.py default the driver measures at round end)
#   2. molecules_v7 -> ~95k steps, then a refined per-stage bond-T mini-
#      sweep (n=1024) and the FINAL 10k-sample eval at the winners
#   3. moses first chunks (VERDICT r2 #6: zero rows so far)
#   4. coloring3 12-layer chunks with whatever remains (#4)
# Everything long-running stashes via ckpt_bundle.sh so round 5 resumes.
set -u
cd /root/repo
LOG=/tmp/campaign29
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

maybe_stop() { [ -f /tmp/campaign29_stop ] && { echo "stop-file: exiting"; exit 0; } || true; }

# ---- Stage 0: wait for dataset prep (launched by the session) ------------
while [ ! -f data/moseslike50k.npz ]; do sleep 15; done
echo "datasets ready $(date -u +%H:%M:%S)"

# ---- Stage 1: perf probes (idle chip, fresh compile cache) ---------------
probe() {
  name=$1; shift
  echo "=== probe $name start $(date -u +%H:%M:%S) ==="
  timeout -k 120 2400 env "$@" python bench.py > "$LOG/$name.json" 2>&1
  echo "=== probe $name done (exit $?) ==="
  tail -1 "$LOG/$name.json"
}
maybe_stop
probe remat_ref CNF_BENCH_REMAT=1
probe fused_x128 CNF_BENCH_REMAT=0 CNF_BENCH_FUSED=1
# (probe JSONs live in $LOG; the session copies results into PERFORMANCE.md)

# ---- Stage 2: molecules_v7 -> 95k ---------------------------------------
MOL_ARGS=(python experiments/molecule_generation/train.py
  --dataset zinclike250k --data_dir data --max_nodes 24 --grad_clip 15
  --num_steps 100000 --eval_every 2500 --eval_samples 4 --batch_size 192
  --hidden_dim 256 --num_layers_node 6 --num_layers_edge 8
  --num_layers_bond 12 --num_mixtures 16 --node_cond_atoms
  --bond_cond_degree --steps_per_call 4
  --out_dir runs/molecules_v7 --log_every 1000 --resume)

mol_chunk() {
  if [ "$(steps_done molecules_v7)" -ge 95000 ]; then return 0; fi
  run "mol_v7_$1" 3300 "${MOL_ARGS[@]}"
  git add runs/molecules_v7 && git commit -q -m \
    "molecules_v7 $1: metrics ($(steps_done molecules_v7) steps)" \
    -- runs/molecules_v7 || true
}
maybe_stop; mol_chunk w2a
maybe_stop; mol_chunk w2b
maybe_stop; mol_chunk w2c   # catch-up (first chunk pays the fresh compile)

# ---- Stage 3: refined bond-T mini-sweep (n=1024) then the 10k eval ------
maybe_stop
run mol_v7_minisweep 2400 python experiments/sample_eval.py \
  --run runs/molecules_v7 --num_samples 1024 \
  --temperatures "0.85,0.85:0.85:0.6,0.85:0.85:0.5,0.85:0.85:0.7,0.7:0.85:0.6"
git add runs/molecules_v7 && git commit -q -m \
  "molecules_v7: refined bond-T mini-sweep @$(steps_done molecules_v7)" \
  -- runs/molecules_v7 || true

# Final 10k-sample protocol: scalar references + the mini-sweep region
# winnners (hardcoded top-2 of the 57.5k sweep; the session revises this
# line if the mini-sweep moves the optimum).
maybe_stop
run mol_v7_samples10k_final 3600 python experiments/sample_eval.py \
  --run runs/molecules_v7 --num_samples 10240 \
  --temperatures "1.0,0.85,0.85:0.85:0.6,0.85:0.85:0.5"
run mol_v7_diag_final 1200 python benchmarks/molecule_diagnostics.py \
  --run runs/molecules_v7 || true
git add runs/molecules_v7 && git commit -q -m \
  "molecules_v7: FINAL 10k-sample eval @$(steps_done molecules_v7) (scalar + per-stage bond-T)" \
  -- runs/molecules_v7 || true
bash benchmarks/ckpt_bundle.sh stash molecules_v7 2>/dev/null || true

# ---- Stage 4: moses first chunks (VERDICT #6) ----------------------------
MOSES_ARGS=(python experiments/molecule_generation/train.py
  --dataset moseslike50k --data_dir data --max_nodes 24 --grad_clip 15
  --num_steps 30000 --eval_every 2500 --eval_samples 4 --batch_size 192
  --hidden_dim 256 --num_layers_node 6 --num_layers_edge 8
  --num_layers_bond 12 --num_mixtures 16 --node_cond_atoms
  --bond_cond_degree --steps_per_call 4
  --out_dir runs/moses --log_every 1000 --resume)
moses_chunk() {
  if [ "$(steps_done moses)" -ge 30000 ]; then return 0; fi
  run "moses_$1" 3300 "${MOSES_ARGS[@]}"
  git add runs/moses && git commit -q -m \
    "moses $1: metrics ($(steps_done moses) steps)" -- runs/moses || true
}
maybe_stop; moses_chunk c1
maybe_stop
if [ "$(steps_done moses)" -gt 0 ]; then
  run moses_eval1k 1800 python experiments/sample_eval.py \
    --run runs/moses --num_samples 1024 --temperatures "1.0,0.85,0.85:0.85:0.6"
  git add runs/moses && git commit -q -m \
    "moses: 1k-sample eval @$(steps_done moses)" -- runs/moses || true
  bash benchmarks/ckpt_bundle.sh stash moses 2>/dev/null || true
fi

# ---- Stage 5: coloring3 (12-layer) with the remaining window -------------
COL3_ARGS=(python experiments/graph_coloring/train.py
  --num_steps 150000 --eval_every 10000 --eval_samples 8 --batch_size 256
  --hidden_dim 96 --num_layers 12 --num_mixtures 8 --encoding_dim 2
  --steps_per_call 8
  --out_dir runs/coloring3 --log_every 2000 --resume)
col3_chunk() {
  if [ "$(steps_done coloring3)" -ge 150000 ]; then return 0; fi
  run "coloring3_$1" 3300 "${COL3_ARGS[@]}"
  git add runs/coloring3 && git commit -q -m \
    "coloring3 $1 (12-layer): metrics ($(steps_done coloring3) steps)" \
    -- runs/coloring3 || true
}
maybe_stop; col3_chunk c1
maybe_stop; col3_chunk c2
maybe_stop; col3_chunk c3
if [ "$(steps_done coloring3)" -gt 0 ]; then
  run coloring3_sweep 1200 python experiments/sample_eval.py \
    --run runs/coloring3 --temperatures 1.0,0.85,0.7 --num_samples 1024 || true
  git add runs/coloring3 && git commit -q -m \
    "coloring3: temperature sweep @$(steps_done coloring3)" -- runs/coloring3 || true
  bash benchmarks/ckpt_bundle.sh stash coloring3 2>/dev/null || true
fi

echo "campaign29 complete $(date -u +%H:%M:%S)"
