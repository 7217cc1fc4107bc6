#!/bin/bash
# Round-5 follow-up queue — run this FIRST THING in a fresh window (or
# after campaign31/32 drain with chip time left).  Self-sufficient:
# stage 0 regenerates datasets and restores every bundle from the
# bundles/<run> branches (campaign30's idempotent pattern, ADVICE r4).
#
# Contents, by marginal value:
#   1. moses 30k -> 50k (the 30k row is demonstrably under-trained:
#      val bpd still falling 0.5186->0.4985, T=1 validity +8.7 pts over
#      the last 15k) + n=10,240 re-eval with a [0.85,0.85,0.3] arm
#   2. lm_v6 45k -> 60k + IS-128 (the <=0.05 stretch; <=0.08 met)
#   3. anything campaign31/32 left undone (check /tmp/campaign31,
#      /tmp/campaign32 driver logs; stages are idempotent)
set -u
cd /root/repo
LOG=/tmp/campaign33
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
commit_run() {
  for i in 1 2 3; do
    git add "runs/$1" 2>/dev/null && \
      git commit -q -m "$2" -- "runs/$1" 2>/dev/null && return 0
    sleep 7
  done
  echo "commit_run $1 failed (non-fatal)"
}
maybe_stop() { [ -f /tmp/campaign33_stop ] && { echo "stop-file: exiting"; exit 0; } || true; }

# ---- Stage 0: datasets + bundle restore (idempotent) ---------------------
[ -f data/zinclike250k.npz ] || python experiments/molecule_generation/preprocess.py \
  --synthetic 250000 --style zinc_like --name zinclike250k --out_dir data \
  --max_nodes 24 > "$LOG/prep_zinc.log" 2>&1
[ -f data/moseslike50k.npz ] || python experiments/molecule_generation/preprocess.py \
  --synthetic 50000 --style moses_like --name moseslike50k --out_dir data \
  --max_nodes 24 > "$LOG/prep_moses.log" 2>&1
for r in molecules_v7 lm_v6 coloring2 coloring3 moses; do
  bash benchmarks/ckpt_bundle.sh restore "$r" 2>/dev/null || true
done
echo "stage 0 done $(date -u +%H:%M:%S)"

# ---- moses 30k -> 50k ----------------------------------------------------
MOSES_ARGS=(python experiments/molecule_generation/train.py
  --dataset moseslike50k --data_dir data --max_nodes 24 --grad_clip 15
  --num_steps 50000 --eval_every 2500 --eval_samples 4 --batch_size 192
  --hidden_dim 256 --num_layers_node 6 --num_layers_edge 8
  --num_layers_bond 12 --num_mixtures 16 --node_cond_atoms
  --bond_cond_degree --steps_per_call 4
  --out_dir runs/moses --log_every 1000 --resume)
m=0
while [ "$(steps_done moses)" -lt 50000 ] && [ $m -lt 2 ]; do
  m=$((m+1)); maybe_stop
  run "moses_ext$m" 3600 "${MOSES_ARGS[@]}"
  commit_run moses "moses ext$m: metrics ($(steps_done moses) steps)"
done
run moses_eval10k_b 4500 python experiments/sample_eval.py --run runs/moses \
  --num_samples 10240 --temperatures "1.0,0.85:0.85:0.4,0.85:0.85:0.3"
commit_run moses "moses: 10k-sample eval @$(steps_done moses)"
run moses_is128_b 2700 python experiments/eval_bpd.py --run runs/moses \
  --split test --num_samples 128 --compute_dtype float32
commit_run moses "moses: IS-128 fp32 test bound @$(steps_done moses)"
bash benchmarks/ckpt_bundle.sh stash moses 2>/dev/null || true

# ---- coloring corrected re-eval with the multi-sweep repair --------------
# (the campaign31 rows used the single greedy pass: corrected 74.6-77.4%;
# the min-conflicts sweeps landed after — re-measure both runs)
maybe_stop
run coloring3_corrected_v2 2400 python experiments/sample_eval.py \
  --run runs/coloring3 --temperatures 1.0,0.85 --num_samples 1024 --best_of_k 8
commit_run coloring3 "coloring3: multi-sweep corrected re-eval"
run coloring2_corrected_v2 2400 python experiments/sample_eval.py \
  --run runs/coloring2 --temperatures 1.0,0.85 --num_samples 1024 --best_of_k 8
commit_run coloring2 "coloring2: multi-sweep corrected re-eval"

# ---- lm_v6 45k -> 60k + IS-128 -------------------------------------------
LM_FLAGS=(python experiments/language_modeling/train.py
  --corpus synthetic --num_steps 60000 --eval_every 3000 --eval_samples 8
  --batch_size 128 --seq_len 256 --hidden_dim 512 --num_layers 4
  --encoding_dim 4 --num_mixtures 32 --lr 5e-4 --prior hmm
  --prior_states 32 --steps_per_call 1
  --out_dir runs/lm_v6 --log_every 1000 --resume)
l=0
while [ "$(steps_done lm_v6)" -lt 60000 ] && [ $l -lt 3 ]; do
  l=$((l+1)); maybe_stop
  run "lm_v6_ext$l" 3600 "${LM_FLAGS[@]}"
  commit_run lm_v6 "lm_v6 ext$l: metrics ($(steps_done lm_v6) steps)"
done
run lm_v6_is128_b 1800 python experiments/eval_bpd.py --run runs/lm_v6 \
  --split test --num_samples 128 --compute_dtype float32
commit_run lm_v6 "lm_v6: IS-128 fp32 test bound @$(steps_done lm_v6)"
bash benchmarks/ckpt_bundle.sh stash lm_v6 2>/dev/null || true

echo "campaign33 complete $(date -u +%H:%M:%S)"

# ---- perf frontier probes (appended in-window, round 5) ------------------
# The unroll/profile sweep reclassified the train step as fusion-overhead
# bound. scan_blocks=0 removes the flow scan entirely (XLA sees all 8
# layers flat -> global fusion freedom; compile cost ~8x, runtime theory
# says fewer HBM round-trips). K=16 was the profile_step best.
run bench_noscan 2700 env CNF_BENCH_SCAN=0 python bench.py
run bench_K16 1800 env CNF_BENCH_K=16 python bench.py
run bench_noscan_K16 2700 env CNF_BENCH_SCAN=0 CNF_BENCH_K=16 python bench.py
echo "campaign33 probes complete $(date -u +%H:%M:%S)"
