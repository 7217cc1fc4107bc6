#!/bin/bash
# Round-3 TPU queue (VERDICT r2 "next round" items 1, 2, 4, 6, plus the
# IS-128 test bound of item 2 and the 10k-sample metrics of item 1).
#
# Priorities, in order:
#   1. molecules_v6: resume 16k -> 100k steps (raw validity 59.6% -> >=75%)
#   2. lm_v6: HMM prior, K=32, 20M synthetic corpus, 30k steps
#   3. coloring2: fresh 200k-step run (no checkpoint survived r2)
#   4. moses: GraphCNF on moseslike50k with the winning lever pair, 30k
#   5. evals: 10k-sample molecule metrics, IS-128 LM test bound
#
# Mechanics: every training stage is (a) guarded by a target-step check so
# a finished run is never re-entered (its final phase re-runs cost ~10 min
# each), (b) bounded by `timeout -k 600` so SIGTERM triggers the trainer's
# graceful final phase and KILL stays a backstop, (c) stashed to ~/.cache
# right after, so a driver workspace reset can't lose more than one stage.
# A stop-file (/tmp/campaign22_stop) exits between stages so the session
# can borrow the TPU (e.g. for the profiling pass) without killing a run.
set -u
cd /root/repo
LOG=/tmp/campaign22
mkdir -p "$LOG"

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name: timeout $tmo start $(date -u +%H:%M:%S) ==="
  timeout -k 600 "$tmo" "$@" > "$LOG/${name}.log" 2>&1
  echo "=== $name done (exit $?) $(date -u +%H:%M:%S) ==="
  tail -3 "$LOG/${name}.log"
}

# Latest complete checkpoint step across checkpoints{,_last} (0 if none).
steps_done() {
  find "runs/$1" -maxdepth 2 -name 'step_*' -type d 2>/dev/null \
    | grep -E 'step_[0-9]{8}$' | sed 's/.*step_//' | sort | tail -1 \
    | sed 's/^0*//' | grep . || echo 0
}

maybe_stop() { [ -f /tmp/campaign22_stop ] && { echo "stop-file: exiting"; exit 0; } || true; }

# ---- Stage 0: datasets (wiped by resets) + stash restores --------------
[ -f data/zinclike250k.npz ] || python experiments/molecule_generation/preprocess.py \
  --synthetic 250000 --style zinc_like --name zinclike250k --out_dir data \
  --max_nodes 24 > "$LOG/prep_zinc.log" 2>&1
[ -f data/moseslike50k.npz ] || python experiments/molecule_generation/preprocess.py \
  --synthetic 50000 --style moses_like --name moseslike50k --out_dir data \
  --max_nodes 24 > "$LOG/prep_moses.log" 2>&1
for r in molecules_v6 lm_v6 coloring2 moses; do
  bash benchmarks/ckpt_stash.sh restore "$r" 2>/dev/null || true
done

# ---- Stage 1: molecules_v6 to 100k (chunked, stash between) ------------
for chunk in 1 2 3 4 5; do
  maybe_stop
  if [ "$(steps_done molecules_v6)" -ge 100000 ]; then break; fi
  run "mol_v6_c${chunk}" 3600 \
    python experiments/molecule_generation/train.py \
    --dataset zinclike250k --data_dir data --max_nodes 24 \
    --num_steps 100000 --eval_every 2500 --eval_samples 4 --batch_size 192 \
    --hidden_dim 256 --num_layers_node 6 --num_layers_edge 8 \
    --num_mixtures 16 --node_cond_atoms --bond_cond_degree \
    --out_dir runs/molecules_v6 --log_every 1000 --resume
  bash benchmarks/ckpt_stash.sh stash molecules_v6
done

# 10k-sample metrics at the validated temperatures (VERDICT missing #6).
maybe_stop
run mol_v6_samples10k 2400 python experiments/sample_eval.py \
  --run runs/molecules_v6 --temperatures 1.0,0.85 --num_samples 10240

# ---- Stage 2: lm_v6 (HMM prior at scale) -------------------------------
LM_FLAGS=$(cat "$HOME/.cache/cnf_ckpts/lm_v6_prior_flags" 2>/dev/null \
  || echo "--prior logistic")
for chunk in 1 2 3; do
  maybe_stop
  if [ "$(steps_done lm_v6)" -ge 30000 ]; then break; fi
  # shellcheck disable=SC2086
  run "lm_v6_c${chunk}" 3600 \
    python experiments/language_modeling/train.py \
    --corpus synthetic --num_steps 30000 --eval_every 3000 --eval_samples 8 \
    --batch_size 128 --seq_len 256 --hidden_dim 512 --num_layers 4 \
    --encoding_dim 4 --num_mixtures 32 --lr 5e-4 $LM_FLAGS \
    --out_dir runs/lm_v6 --log_every 1000 --resume
  bash benchmarks/ckpt_stash.sh stash lm_v6
done

# IS-128 fp32 test bound (reference test() discipline, VERDICT missing #5).
maybe_stop
run lm_v6_is128 2400 python experiments/eval_bpd.py --run runs/lm_v6 \
  --split test --num_samples 128 --compute_dtype float32

# ---- Stage 3: coloring to 200k ------------------------------------------
for chunk in 1 2 3; do
  maybe_stop
  if [ "$(steps_done coloring2)" -ge 200000 ]; then break; fi
  run "coloring2_c${chunk}" 3600 \
    python experiments/graph_coloring/train.py \
    --num_steps 200000 --eval_every 10000 --eval_samples 8 --batch_size 256 \
    --hidden_dim 96 --num_layers 6 --num_mixtures 8 --encoding_dim 2 \
    --out_dir runs/coloring2 --log_every 2000 --resume
  bash benchmarks/ckpt_stash.sh stash coloring2
done
maybe_stop
run coloring2_sweep 1200 python experiments/sample_eval.py \
  --run runs/coloring2 --temperatures 1.0,0.85,0.7 --num_samples 1024

# ---- Stage 4: Moses-parity run ------------------------------------------
for chunk in 1 2; do
  maybe_stop
  if [ "$(steps_done moses)" -ge 30000 ]; then break; fi
  run "moses_c${chunk}" 3600 \
    python experiments/molecule_generation/train.py \
    --dataset moseslike50k --data_dir data --max_nodes 24 \
    --num_steps 30000 --eval_every 2500 --eval_samples 4 --batch_size 192 \
    --hidden_dim 256 --num_layers_node 6 --num_layers_edge 8 \
    --num_mixtures 16 --node_cond_atoms --bond_cond_degree \
    --out_dir runs/moses --log_every 1000 --resume
  bash benchmarks/ckpt_stash.sh stash moses
done
maybe_stop
run moses_samples 1200 python experiments/sample_eval.py \
  --run runs/moses --temperatures 1.0,0.85 --num_samples 1024

echo "campaign22 complete $(date -u +%H:%M:%S)"
