#!/bin/bash
# Round-3 TPU queue, window 2+ (fresh machine: ~/.cache was wiped, so the
# campaign22 checkpoints are GONE — molecules_v6@45k, coloring2, lm_v6 all
# restart from zero).  Since we restart anyway, the molecule run becomes
# molecules_v7: the v6 lever pair PLUS the round-3 bond-stage capacity fix
# (--num_layers_bond 12) targeting the diagnosed double-bond deficit
# (RESULTS.md diagnostics: stage 3 emits ~8-10% double bonds vs the data's
# ~21%), and steps_per_call=4 to amortize tunnel round-trips.
#
# Priorities (VERDICT r2 "next round"):
#   1. molecules_v7 -> as many steps as windows allow (target >=75% raw
#      validity), 10k-sample metrics at the end of every chunk's window
#   2. lm_v6: HMM prior (A/B winner), K=32, 20M corpus, 30k steps + IS-128
#   3. ablation hygiene: capacity-matched vardeq + learned decoder (cheap)
#   4. coloring2 / moses with whatever remains
#
# Mechanics are campaign22's: target-step guards, timeout -k 600 for the
# SIGTERM-graceful final phase, stash after every chunk, stop-file
# (/tmp/campaign24_stop) to borrow the chip between stages.
set -u
cd /root/repo
LOG=/tmp/campaign24
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

maybe_stop() { [ -f /tmp/campaign24_stop ] && { echo "stop-file: exiting"; exit 0; } || true; }

# ---- Stage 0: wait for datasets + bench, restore stashes ----------------
for i in $(seq 1 120); do [ -f "$LOG/prep.done" ] && break; sleep 10; done
[ -f data/zinclike250k.npz ] || { echo "FATAL: no dataset"; exit 1; }
# Don't contend with the one-off bench run for the chip.
for i in $(seq 1 90); do
  grep -q '"metric"' "$LOG/bench_k8.log" 2>/dev/null && break
  pgrep -x -a python | grep -q "bench.py" || break
  sleep 10
done
for r in molecules_v7 lm_v6 coloring2 moses shuffle_vardeq_cm \
         shuffle_decoder_mlp; do
  bash benchmarks/ckpt_stash.sh restore "$r" 2>/dev/null || true
done

# ---- Stage 1: molecules_v7 (bond-capacity fix, steps_per_call=4) --------
for chunk in 1 2 3 4 5; do
  maybe_stop
  if [ "$(steps_done molecules_v7)" -ge 100000 ]; then break; fi
  run "mol_v7_c${chunk}" 3300 \
    python experiments/molecule_generation/train.py \
    --dataset zinclike250k --data_dir data --max_nodes 24 \
    --num_steps 100000 --eval_every 2500 --eval_samples 4 --batch_size 192 \
    --hidden_dim 256 --num_layers_node 6 --num_layers_edge 8 \
    --num_layers_bond 12 --num_mixtures 16 --node_cond_atoms \
    --bond_cond_degree --steps_per_call 4 \
    --out_dir runs/molecules_v7 --log_every 1000 --resume
  bash benchmarks/ckpt_stash.sh stash molecules_v7
  # 10k-sample metrics after EVERY chunk (VERDICT missing #6): each
  # window's best checkpoint gets a non-waypoint n>=10k measurement even
  # if the next window never comes.
  run "mol_v7_samples10k_c${chunk}" 2400 python experiments/sample_eval.py \
    --run runs/molecules_v7 --temperatures 1.0,0.85 --num_samples 10240
  git add runs/molecules_v7 && git commit -q -m \
    "molecules_v7 chunk ${chunk}: metrics + 10k-sample eval" || true
done

# ---- Stage 2: lm_v6 (HMM prior at scale — the A/B winner) ---------------
for chunk in 1 2 3; do
  maybe_stop
  if [ "$(steps_done lm_v6)" -ge 30000 ]; then break; fi
  run "lm_v6_c${chunk}" 3300 \
    python experiments/language_modeling/train.py \
    --corpus synthetic --num_steps 30000 --eval_every 3000 --eval_samples 8 \
    --batch_size 128 --seq_len 256 --hidden_dim 512 --num_layers 4 \
    --encoding_dim 4 --num_mixtures 32 --lr 5e-4 --prior hmm \
    --prior_states 32 --steps_per_call 4 \
    --out_dir runs/lm_v6 --log_every 1000 --resume
  bash benchmarks/ckpt_stash.sh stash lm_v6
  git add runs/lm_v6 && git commit -q -m "lm_v6 chunk ${chunk}: metrics" || true
done
# IS-128 fp32 test bound (reference test() discipline, VERDICT missing #5).
maybe_stop
run lm_v6_is128 2400 python experiments/eval_bpd.py --run runs/lm_v6 \
  --split test --num_samples 128 --compute_dtype float32
git add runs/lm_v6 && git commit -q -m "lm_v6: IS-128 fp32 test bound" || true

# ---- Stage 3: ablation hygiene (VERDICT #7, cheap) -----------------------
maybe_stop
if [ "$(steps_done shuffle_vardeq_cm)" -lt 25000 ]; then
  run shuffle_vardeq_cm 2700 python experiments/set_shuffling/train.py \
    --encoding vardeq --vardeq_blocks 4 --vardeq_hidden 96 \
    --vardeq_mixtures 8 --num_steps 25000 --eval_every 2500 \
    --eval_samples 16 --batch_size 1024 --num_layers 8 --hidden_dim 96 \
    --steps_per_call 8 \
    --out_dir runs/shuffle_vardeq_cm --log_every 1000 --resume
  bash benchmarks/ckpt_stash.sh stash shuffle_vardeq_cm
fi
maybe_stop
if [ "$(steps_done shuffle_decoder_mlp)" -lt 20000 ]; then
  run shuffle_decoder_mlp 2700 python experiments/set_shuffling/train.py \
    --decoder mlp --num_steps 20000 --eval_every 2500 --eval_samples 16 \
    --batch_size 1024 --num_layers 8 --hidden_dim 96 --steps_per_call 8 \
    --out_dir runs/shuffle_decoder_mlp --log_every 1000 --resume
  bash benchmarks/ckpt_stash.sh stash shuffle_decoder_mlp
fi
git add runs/shuffle_vardeq_cm runs/shuffle_decoder_mlp 2>/dev/null \
  && git commit -q -m "ablation hygiene: capacity-matched vardeq + mlp decoder" || true

# ---- Stage 4: coloring2 / moses with whatever remains --------------------
for chunk in 1 2 3; do
  maybe_stop
  if [ "$(steps_done coloring2)" -ge 200000 ]; then break; fi
  run "coloring2_c${chunk}" 3300 \
    python experiments/graph_coloring/train.py \
    --num_steps 200000 --eval_every 10000 --eval_samples 8 --batch_size 256 \
    --hidden_dim 96 --num_layers 6 --num_mixtures 8 --encoding_dim 2 \
    --steps_per_call 8 \
    --out_dir runs/coloring2 --log_every 2000 --resume
  bash benchmarks/ckpt_stash.sh stash coloring2
  git add runs/coloring2 && git commit -q -m "coloring2 chunk ${chunk}" || true
done
maybe_stop
run coloring2_sweep 1200 python experiments/sample_eval.py \
  --run runs/coloring2 --temperatures 1.0,0.85,0.7 --num_samples 1024

for chunk in 1 2; do
  maybe_stop
  if [ "$(steps_done moses)" -ge 30000 ]; then break; fi
  run "moses_c${chunk}" 3300 \
    python experiments/molecule_generation/train.py \
    --dataset moseslike50k --data_dir data --max_nodes 24 \
    --num_steps 30000 --eval_every 2500 --eval_samples 4 --batch_size 192 \
    --hidden_dim 256 --num_layers_node 6 --num_layers_edge 8 \
    --num_mixtures 16 --node_cond_atoms --bond_cond_degree \
    --steps_per_call 4 \
    --out_dir runs/moses --log_every 1000 --resume
  bash benchmarks/ckpt_stash.sh stash moses
  git add runs/moses && git commit -q -m "moses chunk ${chunk}" || true
done

echo "campaign24 complete $(date -u +%H:%M:%S)"
