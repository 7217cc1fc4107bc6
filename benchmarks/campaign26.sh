#!/bin/bash
# NEXT-WINDOW queue (round 3 window 4 / round 4 window 1).  Machines are
# base-imaged between windows: stage 0 regenerates datasets and restores
# training state from the git-committed persist/ bundles (ckpt_bundle.sh;
# ckpt_stash.sh first in case ~/.cache survived for once).
#
# Priorities:
#   1. lm_v6 -> 45k + IS-128 fp32 test bound (VERDICT r2 #2; gap 0.112
#      @21k and falling ~0.005/1k — the <=0.08 bar lands before 45k)
#   2. coloring2: the one VERDICT item (#4, >=90% valid) with no round-3
#      TPU hours yet — two chunks up front
#   3. molecules_v7 -> 100k in chunks + n=10240 evals (VERDICT #1)
#   4. moses parity run (#6), ablation arms (#7)
#   5. idle-slot kernel_bench/lm_bench re-measurement (voided ratios)
set -u
cd /root/repo
LOG=/tmp/campaign26
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

maybe_stop() { [ -f /tmp/campaign26_stop ] && { echo "stop-file: exiting"; exit 0; } || true; }

# ---- Stage 0 --------------------------------------------------------------
[ -f data/zinclike250k.npz ] || python experiments/molecule_generation/preprocess.py \
  --synthetic 250000 --style zinc_like --name zinclike250k --out_dir data \
  --max_nodes 24 > "$LOG/prep_zinc.log" 2>&1
[ -f data/moseslike50k.npz ] || python experiments/molecule_generation/preprocess.py \
  --synthetic 50000 --style moses_like --name moseslike50k --out_dir data \
  --max_nodes 24 > "$LOG/prep_moses.log" 2>&1
for r in molecules_v7 lm_v6 coloring2 moses; do
  bash benchmarks/ckpt_stash.sh restore "$r" 2>/dev/null || true
  bash benchmarks/ckpt_bundle.sh restore "$r" 2>/dev/null || true
done

MOL_ARGS=(python experiments/molecule_generation/train.py
  --dataset zinclike250k --data_dir data --max_nodes 24 --grad_clip 15
  --num_steps 100000 --eval_every 2500 --eval_samples 4 --batch_size 192
  --hidden_dim 256 --num_layers_node 6 --num_layers_edge 8
  --num_layers_bond 12 --num_mixtures 16 --node_cond_atoms
  --bond_cond_degree --steps_per_call 4
  --out_dir runs/molecules_v7 --log_every 1000 --resume)

# 45k: the gap curve (0.163@12k, 0.129@16k, 0.112@21k, ~-0.005/1k and
# decelerating) extrapolates to the <=0.08 VERDICT bar between 30k-45k.
LM_ARGS=(python experiments/language_modeling/train.py
  --corpus synthetic --num_steps 45000 --eval_every 3000 --eval_samples 8
  --batch_size 128 --seq_len 256 --hidden_dim 512 --num_layers 4
  --encoding_dim 4 --num_mixtures 32 --lr 5e-4 --prior hmm
  --prior_states 32 --steps_per_call 1
  --out_dir runs/lm_v6 --log_every 1000 --resume)

COL_ARGS=(python experiments/graph_coloring/train.py
  --num_steps 200000 --eval_every 10000 --eval_samples 8 --batch_size 256
  --hidden_dim 96 --num_layers 6 --num_mixtures 8 --encoding_dim 2
  --steps_per_call 8
  --out_dir runs/coloring2 --log_every 2000 --resume)

# ---- 1. lm_v6 to 30k + IS-128 --------------------------------------------
if [ "$(steps_done lm_v6)" -lt 45000 ]; then
  maybe_stop
  run lm_v6_w4 3300 "${LM_ARGS[@]}"
  git add runs/lm_v6 && git commit -q -m \
    "lm_v6: metrics ($(steps_done lm_v6) steps)" || true
fi
maybe_stop
if [ "$(steps_done lm_v6)" -gt 0 ] && \
   ! grep -q "posthoc_test" runs/lm_v6/metrics.jsonl 2>/dev/null; then
  run lm_v6_is128 1800 python experiments/eval_bpd.py --run runs/lm_v6 \
    --split test --num_samples 128 --compute_dtype float32
  git add runs/lm_v6 && git commit -q -m "lm_v6: IS-128 fp32 test bound" || true
fi
bash benchmarks/ckpt_bundle.sh stash lm_v6 2>/dev/null || true

# ---- 2. coloring2: two chunks up front ------------------------------------
for chunk in a b; do
  maybe_stop
  if [ "$(steps_done coloring2)" -ge 200000 ]; then break; fi
  run "coloring2_${chunk}" 3300 "${COL_ARGS[@]}"
  git add runs/coloring2 && git commit -q -m \
    "coloring2: metrics ($(steps_done coloring2) steps)" || true
done
maybe_stop
run coloring2_sweep 1200 python experiments/sample_eval.py \
  --run runs/coloring2 --temperatures 1.0,0.85,0.7 --num_samples 1024 || true
git add runs/coloring2 && git commit -q -m "coloring2: temperature sweep" || true
bash benchmarks/ckpt_bundle.sh stash coloring2 2>/dev/null || true

# ---- 3. molecules_v7 chunks + 10k evals -----------------------------------
for chunk in w4a w4b w4c; do
  maybe_stop
  if [ "$(steps_done molecules_v7)" -ge 100000 ]; then break; fi
  run "mol_v7_${chunk}" 3300 "${MOL_ARGS[@]}"
  git add runs/molecules_v7 && git commit -q -m \
    "molecules_v7 ${chunk}: metrics ($(steps_done molecules_v7) steps)" || true
done
maybe_stop
run mol_v7_samples10k_w4 2400 python experiments/sample_eval.py \
  --run runs/molecules_v7 --temperatures 1.0,0.85 --num_samples 10240
run mol_v7_diag 1200 python benchmarks/molecule_diagnostics.py \
  --run runs/molecules_v7 || true
git add runs/molecules_v7 && git commit -q -m \
  "molecules_v7: 10k-sample eval + diagnostics (step $(steps_done molecules_v7))" || true
bash benchmarks/ckpt_bundle.sh stash molecules_v7 2>/dev/null || true

# ---- 4. moses + ablations ---------------------------------------------------
for chunk in 1 2; do
  maybe_stop
  if [ "$(steps_done moses)" -ge 30000 ]; then break; fi
  run "moses_c${chunk}" 3300 \
    python experiments/molecule_generation/train.py \
    --dataset moseslike50k --data_dir data --max_nodes 24 --grad_clip 15 \
    --num_steps 30000 --eval_every 2500 --eval_samples 4 --batch_size 192 \
    --hidden_dim 256 --num_layers_node 6 --num_layers_edge 8 \
    --num_mixtures 16 --node_cond_atoms --bond_cond_degree \
    --steps_per_call 4 \
    --out_dir runs/moses --log_every 1000 --resume
  git add runs/moses && git commit -q -m "moses chunk ${chunk}" || true
done
maybe_stop
if [ "$(steps_done moses)" -gt 0 ]; then
  run moses_samples 1800 python experiments/sample_eval.py \
    --run runs/moses --temperatures 1.0,0.85 --num_samples 10240 || true
  git add runs/moses && git commit -q -m "moses: 10k-sample eval" || true
  bash benchmarks/ckpt_bundle.sh stash moses 2>/dev/null || true
fi

maybe_stop
if [ "$(steps_done shuffle_vardeq_cm)" -lt 25000 ]; then
  run shuffle_vardeq_cm 2700 python experiments/set_shuffling/train.py \
    --encoding vardeq --vardeq_blocks 4 --vardeq_hidden 96 \
    --vardeq_mixtures 8 --num_steps 25000 --eval_every 2500 \
    --eval_samples 16 --batch_size 1024 --num_layers 8 --hidden_dim 96 \
    --steps_per_call 8 \
    --out_dir runs/shuffle_vardeq_cm --log_every 1000 --resume
  git add runs/shuffle_vardeq_cm && git commit -q -m \
    "ablation hygiene: capacity-matched vardeq" || true
fi
maybe_stop
if [ "$(steps_done shuffle_decoder_mlp)" -lt 20000 ]; then
  run shuffle_decoder_mlp 2700 python experiments/set_shuffling/train.py \
    --decoder mlp --num_steps 20000 --eval_every 2500 --eval_samples 16 \
    --batch_size 1024 --num_layers 8 --hidden_dim 96 --steps_per_call 8 \
    --out_dir runs/shuffle_decoder_mlp --log_every 1000 --resume
  git add runs/shuffle_decoder_mlp && git commit -q -m \
    "ablation hygiene: mlp learned decoder (C13 end-to-end)" || true
fi

# ---- 5. idle-slot kernel re-measurements (voided ratios) -------------------
maybe_stop
run kernel_bench 1800 python benchmarks/kernel_bench.py || true
run lm_bench 1500 python benchmarks/lm_bench.py || true
# batch-scaling anomaly (diagnostic probe 6: B=4096 superlinearly SLOWER):
# two more points to localize the knee
maybe_stop
run bench_b2048 900 env CNF_BENCH_BATCH=2048 python bench.py || true
# one-shot jax.profiler trace of the honest step (device-trace support
# through the tunnel unknown; host-side spans still useful)
run profile_trace 1200 python benchmarks/profile_step.py \
  --out /tmp/cnf_profile --trace_steps 4 || true
run bench_b512 900 env CNF_BENCH_BATCH=512 python bench.py || true
git add RESULTS.md 2>/dev/null || true

echo "campaign26 complete $(date -u +%H:%M:%S)"
