#!/bin/bash
# Round-3 follow-on TPU queue (run after campaign22 drains):
#   1. honest perf measurement of the multi-step bench (K=8) on an IDLE
#      chip + a jax.profiler trace of the flagship step (VERDICT #3)
#   2. ablation hygiene (VERDICT #7): capacity-matched vardeq arm and a
#      learned-decoder (C13) end-to-end run on set shuffling
#   3. IS-128 fp32 test bounds for the flagship quality runs
set -u
cd /root/repo
LOG=/tmp/campaign23
mkdir -p "$LOG"

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name: timeout $tmo start $(date -u +%H:%M:%S) ==="
  timeout -k 600 "$tmo" "$@" > "$LOG/${name}.log" 2>&1
  echo "=== $name done (exit $?) $(date -u +%H:%M:%S) ==="
  tail -3 "$LOG/${name}.log"
}

maybe_stop() { [ -f /tmp/campaign23_stop ] && { echo "stop-file: exiting"; exit 0; } || true; }

# 1. Honest bench on an idle chip (the number the driver records).
run bench_k8 1800 python bench.py
maybe_stop

# Profile trace of the flagship training step (out: /tmp/cnf_profile).
run profile 1800 python benchmarks/profile_step.py --out /tmp/cnf_profile
maybe_stop

# 2a. Capacity-matched vardeq on shuffling (paper Table-1 baseline ≈3.0;
#     the r2 cell used a deliberately minimal dequant flow -> 4.00).
run shuffle_vardeq_cm 3300 python experiments/set_shuffling/train.py \
  --encoding vardeq --vardeq_blocks 4 --vardeq_hidden 96 \
  --vardeq_mixtures 8 --num_steps 25000 --eval_every 2500 \
  --eval_samples 16 --batch_size 1024 --num_layers 8 --hidden_dim 96 \
  --out_dir runs/shuffle_vardeq_cm --log_every 1000 --resume
bash benchmarks/ckpt_stash.sh stash shuffle_vardeq_cm
maybe_stop

# 2b. Learned-decoder ablation (C13) end-to-end.
run shuffle_decoder_mlp 2700 python experiments/set_shuffling/train.py \
  --decoder mlp --num_steps 20000 --eval_every 2500 --eval_samples 16 \
  --batch_size 1024 --num_layers 8 --hidden_dim 96 \
  --out_dir runs/shuffle_decoder_mlp --log_every 1000 --resume
bash benchmarks/ckpt_stash.sh stash shuffle_decoder_mlp
maybe_stop

# 3. IS-128 fp32 test bounds (reference test() discipline).
run mol_v6_is128 2400 python experiments/eval_bpd.py --run runs/molecules_v6 \
  --split test --num_samples 128 --compute_dtype float32
maybe_stop

# 4. LM throughput re-measurement (RESULTS.md row was deferred in r2).
run lm_bench 1800 python benchmarks/lm_bench.py
maybe_stop

# 5. Per-stage temperature grid on the finished molecules_v6 targeting
#    the two diagnosed failure modes (bond T vs double-bond deficit,
#    exist T vs fragmentation) — writes runs/molecules_v6/
#    temperature_sweep.json.
run mol_v6_stage_sweep 1800 python experiments/sample_eval.py \
  --run runs/molecules_v6 --num_samples 1024 \
  --temperatures "1.0,0.85,0.85:0.85:1.0,0.85:0.7:0.85,0.9:0.8:1.0"

# Fresh post-training diagnostics (double-bond marginal, fragmentation).
run mol_v6_diag 600 python benchmarks/molecule_diagnostics.py \
  --run runs/molecules_v6 --num_samples 256

echo "campaign23 complete $(date -u +%H:%M:%S)"
