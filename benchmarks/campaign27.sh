#!/bin/bash
# Round-4 window-1 TPU queue.  Same machine as round 3's last window
# (~/.cache + data/ survived; campaign25c still draining when this was
# written — stage -1 waits for it).  Priorities, from VERDICT r2 +
# round-3 outcomes:
#   1. lm_v6 -> 45k + IS-128 fp32 bound (gap 0.0906@21k, -0.005/1k:
#      the <=0.08 bar should fall before 45k; extend to 60k if not)
#   2. molecules_v7 -> 100k (57.5k now) + per-stage BOND-temperature
#      sweep: raw validity is nearly flat in steps (60.3%@7k ->
#      63.4%@57.5k T0.85) while bpd falls, so sampling-time stage
#      temperatures are the cheapest untried validity lever
#   3. coloring3: FRESH deep run — coloring2 plateaued (65.4%@75k ->
#      66.5%@136k) but the depth A/B (runs_ab/color_deep, 12 layers)
#      beat base 38.0% vs 24.3% at 4k steps with better bpd;
#      depth, not steps, is the live lever toward >90%
#   4. moses parity run (VERDICT #6) with the v7 lever pair
#   5. idle-slot: batch-scaling probes + remat lever on bench.py,
#      kernel_bench re-measurement (voided ratios)
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

lm_gap() {  # last posthoc_test gap, 9.9 if none
  python - <<'EOF'
import json
gap = 9.9
try:
    for line in open("runs/lm_v6/metrics.jsonl"):
        r = json.loads(line)
        if r.get("prefix") == "posthoc_test":
            gap = r["gap_to_optimum"]
except FileNotFoundError:
    pass
print(gap)
EOF
}

# ---- Stage -1: wait for campaign25c's TPU work to drain ------------------
while kill -0 10849 2>/dev/null; do sleep 30; done
echo "campaign25c exited $(date -u +%H:%M:%S)"

# ---- Stage 0: datasets (idempotent; this machine kept data/) -------------
[ -f data/zinclike250k.npz ] || python experiments/molecule_generation/preprocess.py \
  --synthetic 250000 --style zinc_like --name zinclike250k --out_dir data \
  --max_nodes 24 > "$LOG/prep_zinc.log" 2>&1
[ -f data/moseslike50k.npz ] || python experiments/molecule_generation/preprocess.py \
  --synthetic 50000 --style moses_like --name moseslike50k --out_dir data \
  --max_nodes 24 > "$LOG/prep_moses.log" 2>&1
for r in molecules_v7 lm_v6 coloring2 coloring3 moses; do
  bash benchmarks/ckpt_stash.sh restore "$r" 2>/dev/null || true
  bash benchmarks/ckpt_bundle.sh restore "$r" 2>/dev/null || true
done

LM_ARGS=(python experiments/language_modeling/train.py
  --corpus synthetic --num_steps 45000 --eval_every 3000 --eval_samples 8
  --batch_size 128 --seq_len 256 --hidden_dim 512 --num_layers 4
  --encoding_dim 4 --num_mixtures 32 --lr 5e-4 --prior hmm
  --prior_states 32 --steps_per_call 1
  --out_dir runs/lm_v6 --log_every 1000 --resume)

MOL_ARGS=(python experiments/molecule_generation/train.py
  --dataset zinclike250k --data_dir data --max_nodes 24 --grad_clip 15
  --num_steps 100000 --eval_every 2500 --eval_samples 4 --batch_size 192
  --hidden_dim 256 --num_layers_node 6 --num_layers_edge 8
  --num_layers_bond 12 --num_mixtures 16 --node_cond_atoms
  --bond_cond_degree --steps_per_call 4
  --out_dir runs/molecules_v7 --log_every 1000 --resume)

# color_deep lever: 12 layers (A/B: validity 38.0% vs 6-layer 24.3% and
# bpd 1.034 vs 1.123 at 4k steps).  Width was WORSE (color_wide 21.8%).
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

lm_chunk() {
  if [ "$(steps_done lm_v6)" -ge "$2" ]; then return 0; fi
  run "lm_v6_$1" 3300 "${LM_ARGS[@]}" --num_steps "$2"
  git add runs/lm_v6 && git commit -q -m \
    "lm_v6 $1: metrics ($(steps_done lm_v6) steps)" -- runs/lm_v6 || true
}

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

# ---- 1. lm_v6 to 45k + IS-128 --------------------------------------------
maybe_stop; lm_chunk r4a 45000
maybe_stop; lm_chunk r4b 45000
if [ "$(steps_done lm_v6)" -gt 21000 ]; then
  run lm_v6_is128_45k 1800 python experiments/eval_bpd.py --run runs/lm_v6 \
    --split test --num_samples 128 --compute_dtype float32
  git add runs/lm_v6 && git commit -q -m \
    "lm_v6: IS-128 fp32 test bound @$(steps_done lm_v6)" -- runs/lm_v6 || true
fi
# Extension round if the 0.08 bar didn't fall
if python -c "import sys; sys.exit(0 if float('$(lm_gap)') > 0.0805 else 1)"; then
  maybe_stop; lm_chunk r4c 60000
  run lm_v6_is128_60k 1800 python experiments/eval_bpd.py --run runs/lm_v6 \
    --split test --num_samples 128 --compute_dtype float32
  git add runs/lm_v6 && git commit -q -m \
    "lm_v6: IS-128 fp32 test bound @$(steps_done lm_v6)" -- runs/lm_v6 || true
fi
bash benchmarks/ckpt_bundle.sh stash lm_v6 2>/dev/null || true

# ---- 2. molecule per-stage bond-temperature sweep (cheap, n=1024) ---------
maybe_stop
run mol_stage_sweep 2400 python experiments/sample_eval.py \
  --run runs/molecules_v7 --num_samples 1024 \
  --temperatures "1.0,0.85,1:1:0.8,1:1:0.7,1:1:0.6,0.85:1:0.7,0.85:0.85:0.6"
git add runs/molecules_v7 && git commit -q -m \
  "molecules_v7: per-stage bond-temperature sweep (n=1024)" \
  -- runs/molecules_v7 || true

# ---- 3. interleave mol->100k with coloring3 -------------------------------
maybe_stop; mol_chunk r4a
maybe_stop; col3_chunk c1
maybe_stop; mol_chunk r4b
maybe_stop; col3_chunk c2
maybe_stop; mol_chunk r4c   # catch-up if r4a/r4b didn't reach 100k
# final molecule eval: scalar Ts + the per-stage shapes the sweep probes
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

# ---- 4. moses parity run ---------------------------------------------------
for chunk in c1 c2; do
  maybe_stop
  if [ "$(steps_done moses)" -ge 30000 ]; then break; fi
  run "moses_$chunk" 3300 "${MOSES_ARGS[@]}"
  git add runs/moses && git commit -q -m \
    "moses $chunk: metrics ($(steps_done moses) steps)" -- runs/moses || true
done
maybe_stop
if [ "$(steps_done moses)" -gt 0 ]; then
  run moses_samples10k 3000 python experiments/sample_eval.py \
    --run runs/moses --num_samples 10240 --temperatures "1.0,0.85,1:1:0.7"
  git add runs/moses && git commit -q -m "moses: 10k-sample eval" \
    -- runs/moses || true
  bash benchmarks/ckpt_bundle.sh stash moses 2>/dev/null || true
fi

# ---- 5. more coloring3 + its sweep ----------------------------------------
maybe_stop; col3_chunk c3
maybe_stop; col3_chunk c4
maybe_stop
run coloring3_sweep 1200 python experiments/sample_eval.py \
  --run runs/coloring3 --temperatures 1.0,0.85,0.7 --num_samples 1024 || true
git add runs/coloring3 && git commit -q -m "coloring3: temperature sweep" \
  -- runs/coloring3 || true
bash benchmarks/ckpt_bundle.sh stash coloring3 2>/dev/null || true
# coloring2 never got its 200k sweep either
run coloring2_sweep 1200 python experiments/sample_eval.py \
  --run runs/coloring2 --temperatures 1.0,0.85,0.7 --num_samples 1024 || true
git add runs/coloring2 && git commit -q -m "coloring2: temperature sweep" \
  -- runs/coloring2 || true

# ---- 6. idle-slot perf probes ----------------------------------------------
maybe_stop
run bench_base 900 python bench.py || true
run bench_remat 900 env CNF_BENCH_REMAT=1 python bench.py || true
run bench_b2048 900 env CNF_BENCH_BATCH=2048 python bench.py || true
run bench_b512 900 env CNF_BENCH_BATCH=512 python bench.py || true
run kernel_bench 1800 python benchmarks/kernel_bench.py || true

echo "campaign27 complete $(date -u +%H:%M:%S)"
