#!/bin/bash
# Continuation of campaign25 after the mid-window diagnostic pause
# (stop-file exited campaign25 after mol_v7 chunk c1).  Same priority
# ladder; adds git-committed resume bundles (ckpt_bundle.sh) because
# ~/.cache does NOT survive the between-window machine resets.
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

maybe_stop() { [ -f /tmp/campaign25_stop ] && { echo "stop-file: exiting"; exit 0; } || true; }

# steps_per_call is a non-architecture flag.  v7 steady state measured
# 6.19 steps/s at K=4 vs v6's 7.58 at K=1 — the 18% is the 12-layer bond
# stage, not the K-scan (c1's first logged window, 1.41/s, was residual
# compile/warmup).  GraphCNF is device-bound; K neither helps nor hurts.
MOL_K=${MOL_K:-4}

# grad_clip 15: the 12-layer bond stage spiked at ~9k steps (grad_norm 16,
# loss 0.49->0.76, 7k steps of progress lost) where v6@clip100 never did;
# post-warmup norms run 3-8 so 15 engages only on spikes.  Non-arch flag.
MOL_ARGS=(python experiments/molecule_generation/train.py
  --dataset zinclike250k --data_dir data --max_nodes 24 --grad_clip 15
  --num_steps 100000 --eval_every 2500 --eval_samples 4 --batch_size 192
  --hidden_dim 256 --num_layers_node 6 --num_layers_edge 8
  --num_layers_bond 12 --num_mixtures 16 --node_cond_atoms
  --bond_cond_degree --steps_per_call "$MOL_K"
  --out_dir runs/molecules_v7 --log_every 1000 --resume)

LM_ARGS=(python experiments/language_modeling/train.py
  --corpus synthetic --num_steps 30000 --eval_every 3000 --eval_samples 8
  --batch_size 128 --seq_len 256 --hidden_dim 512 --num_layers 4
  --encoding_dim 4 --num_mixtures 32 --lr 5e-4 --prior hmm
  --prior_states 32 --steps_per_call 1
  --out_dir runs/lm_v6 --log_every 1000 --resume)

mol_chunk() {
  if [ "$(steps_done molecules_v7)" -ge 100000 ]; then return 0; fi
  run "mol_v7_$1" "$2" "${MOL_ARGS[@]}"
  bash benchmarks/ckpt_stash.sh stash molecules_v7 || true
  git add runs/molecules_v7 && git commit -q -m \
    "molecules_v7 $1: metrics ($(steps_done molecules_v7) steps)" || true
}

mol_eval10k() {
  run "mol_v7_samples10k_$1" 2400 python experiments/sample_eval.py \
    --run runs/molecules_v7 --temperatures 1.0,0.85 --num_samples 10240
  git add runs/molecules_v7 && git commit -q -m \
    "molecules_v7: 10k-sample eval $1 (step $(steps_done molecules_v7))" || true
}

lm_chunk() {
  if [ "$(steps_done lm_v6)" -ge 30000 ]; then return 0; fi
  run "lm_v6_$1" "$2" "${LM_ARGS[@]}"
  bash benchmarks/ckpt_stash.sh stash lm_v6 || true
  git add runs/lm_v6 && git commit -q -m \
    "lm_v6 $1: metrics ($(steps_done lm_v6) steps)" || true
}

# ---- Stage 0: datasets + resume sources (next-window relaunch path) ------
[ -f data/zinclike250k.npz ] || python experiments/molecule_generation/preprocess.py \
  --synthetic 250000 --style zinc_like --name zinclike250k --out_dir data \
  --max_nodes 24 > "$LOG/prep_zinc.log" 2>&1
[ -f data/moseslike50k.npz ] || python experiments/molecule_generation/preprocess.py \
  --synthetic 50000 --style moses_like --name moseslike50k --out_dir data \
  --max_nodes 24 > "$LOG/prep_moses.log" 2>&1
for r in molecules_v7 lm_v6 coloring2 moses shuffle_vardeq_cm \
         shuffle_decoder_mlp; do
  bash benchmarks/ckpt_stash.sh restore "$r" 2>/dev/null || true
  bash benchmarks/ckpt_bundle.sh restore "$r" 2>/dev/null || true
done

# Robust priority order for an uncertain window horizon: LM first (zero
# TPU steps across two rounds = the repeated miss), then the guaranteed
# n>=10k molecule eval on the c1 checkpoint, then more molecule chunks.
maybe_stop; lm_chunk c1 3300   # K=1: K=4 OOMd (f32[K,T,B,H] saved activations, see lm_v6_c1.log)
maybe_stop; mol_chunk c2 3300
maybe_stop; lm_chunk c2 3300
maybe_stop
if [ "$(steps_done lm_v6)" -gt 0 ]; then
  run lm_v6_is128 1800 python experiments/eval_bpd.py --run runs/lm_v6 \
    --split test --num_samples 128 --compute_dtype float32
  git add runs/lm_v6 && git commit -q -m "lm_v6: IS-128 fp32 test bound" || true
  bash benchmarks/ckpt_bundle.sh stash lm_v6 || true
fi
maybe_stop; mol_chunk c3 3300
maybe_stop; mol_eval10k e2
bash benchmarks/ckpt_bundle.sh stash molecules_v7 || true

# ---- Leftovers ------------------------------------------------------------
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

for chunk in 1 2 3; do
  maybe_stop
  if [ "$(steps_done coloring2)" -ge 200000 ]; then break; fi
  run "coloring2_c${chunk}" 3300 \
    python experiments/graph_coloring/train.py \
    --num_steps 200000 --eval_every 10000 --eval_samples 8 --batch_size 256 \
    --hidden_dim 96 --num_layers 6 --num_mixtures 8 --encoding_dim 2 \
    --steps_per_call 8 \
    --out_dir runs/coloring2 --log_every 2000 --resume
  git add runs/coloring2 && git commit -q -m "coloring2 chunk ${chunk}" || true
done
bash benchmarks/ckpt_bundle.sh stash coloring2 2>/dev/null || true

for chunk in 1 2; do
  maybe_stop
  if [ "$(steps_done moses)" -ge 30000 ]; then break; fi
  run "moses_c${chunk}" 3300 \
    python experiments/molecule_generation/train.py \
    --dataset moseslike50k --data_dir data --max_nodes 24 \
    --num_steps 30000 --eval_every 2500 --eval_samples 4 --batch_size 192 \
    --hidden_dim 256 --num_layers_node 6 --num_layers_edge 8 \
    --num_mixtures 16 --node_cond_atoms --bond_cond_degree \
    --steps_per_call 1 \
    --out_dir runs/moses --log_every 1000 --resume
  git add runs/moses && git commit -q -m "moses chunk ${chunk}" || true
done

echo "campaign25b complete $(date -u +%H:%M:%S)"
