#!/bin/bash
# Round-2 (second extension) queue — replaces campaign17's controller.
#
# The round restarted fresh again at ~12:02 UTC Aug 18 (ends ~00:00);
# caps re-timed for that window (global 22:45).  Order
# (re-planned at 11:15 after the CPU lever A/Bs): coloring (quick verdict
# item) → lm_v6 30k (likeliest verdict flip; lm_v4 peaked at 15k) →
# IS-128 bound → molecules_v5 resume (top_next, gets the rest to 16:45)
# → sweep/diagnostics → benches.  Every stage is probe-gated (timeouts
# start only once the tunnel answers) and checkpointed; nothing is lost
# to preemption.
#
# Usage: campaign18.sh
set -u
cd /root/repo

wait_tpu() {
  local n=0
  while ! timeout 90 python -c "import jax; jax.devices()" \
      > /dev/null 2>&1; do
    n=$((n + 1))
    echo "tunnel probe $n failed; retrying in 120s ($(date -u +%H:%M))"
    sleep 120
  done
  echo "tunnel healthy at $(date -u +%H:%M) after $n failed probes"
}

# Seconds until HH:MM UTC today/tomorrow (always positive, <24h).
secs_until() {
  local target now
  target=$(date -u -d "$1" +%s)
  now=$(date -u +%s)
  if [ "$target" -le "$now" ]; then
    target=$(date -u -d "tomorrow $1" +%s)
  fi
  echo $((target - now))
}

# Cap a stage timeout at the remaining window before HH:MM (UTC, today).
# Past-the-cutoff is decided by clock comparison, NOT by secs_until
# wrapping (a >12h window is legitimate for an early controller start).
cap_at() {
  local tmo=$1 cutoff=$2 left now_hm cut_hm
  now_hm=$(date -u +%H%M); cut_hm=${cutoff/:/}
  if [ "$((10#$now_hm))" -ge "$((10#$cut_hm))" ]; then echo 0; return; fi
  left=$(secs_until "$cutoff")
  if [ "$tmo" -gt "$left" ]; then tmo=$left; fi
  echo "$tmo"
}

run() {
  name=$1; tmo=$2; shift 2
  tmo=$(cap_at "$tmo" "22:45")
  if [ "$tmo" -lt 300 ]; then
    echo "=== $name SKIPPED (window $tmo s too small) ==="
    return
  fi
  wait_tpu
  tmo=$(cap_at "$tmo" "22:45")   # re-cap: probing may have eaten hours
  if [ "$tmo" -lt 300 ]; then
    echo "=== $name SKIPPED post-probe (window too small) ==="
    return
  fi
  echo "=== $name: timeout $tmo $* ==="
  timeout "$tmo" "$@" > "/tmp/campaign18_${name}.log" 2>&1
  echo "=== $name done (exit $?) ==="
  tail -4 "/tmp/campaign18_${name}.log"
}

# 1. Coloring 75k (VERDICT r1 #5) — short, finishes a verdict item.
if ! grep -q '"step": 75000' runs/coloring/metrics.jsonl 2>/dev/null; then
  run coloring_75k 5400 python experiments/graph_coloring/train.py \
    --num_steps 75000 --eval_every 5000 --eval_samples 8 \
    --out_dir runs/coloring --log_every 2000 --resume
fi

run coloring_samples 3600 python experiments/sample_eval.py \
  --run runs/coloring --temperatures 1.0,0.85,0.7 --num_samples 1024

# 2. LM gap push (VERDICT r1 #2): 4 blocks, K=32, 20M-char corpus.
#    Runs BEFORE the molecule resume: it is the likeliest verdict flip
#    and lm_v4 peaked at 15k steps, so 30k (~2h) captures the peak while
#    leaving the molecule window.  input_feats stays OUT of the primary
#    run (CPU A/B had the lever arm slightly behind at 2.5k steps, the
#    5k-step extension informs round 3).
LM_TMO=$(cap_at 9000 "19:30")
run lm_v6 "$LM_TMO" python experiments/language_modeling/train.py \
  --corpus synthetic --num_steps 30000 --eval_every 3000 --eval_samples 8 \
  --batch_size 128 --seq_len 256 --hidden_dim 512 --num_layers 4 \
  --encoding_dim 4 --num_mixtures 32 --lr 5e-4 \
  --out_dir runs/lm_v6 --log_every 2000

run lm_v6_is128 3600 python experiments/eval_bpd.py \
  --run runs/lm_v6 --num_samples 128 --split test

# 3. Molecules (VERDICT r1 #1 / top_next): the single-lever CPU A/Bs
#    localized the combined-arm regression to live_edges, and the two
#    winners COMPOSE: node_cond_atoms + bond_cond_degree reach 81.1%
#    ±2.4 validity vs base 73.9% ±2.7 (n=1024, non-overlapping CIs) with
#    the best bpd of all arms.  The TPU window therefore goes to a FRESH
#    molecules_v6 with the winning pair (v5 architecture otherwise);
#    the v5 resume is superseded (its 20k numbers are already recorded).
MOL_TMO=$(cap_at 99999 "21:30")
run molecules_v6 "$MOL_TMO" \
  python experiments/molecule_generation/train.py \
  --dataset zinclike250k --data_dir data --max_nodes 24 \
  --num_steps 100000 --eval_every 5000 --eval_samples 4 --batch_size 192 \
  --hidden_dim 256 --num_layers_node 6 --num_layers_edge 8 \
  --num_mixtures 16 --node_cond_atoms --bond_cond_degree \
  --out_dir runs/molecules_v6 --log_every 2000

if python - <<'PYEOF'
import sys
sys.path.insert(0, ".")
from categoricalnf_tpu.training.checkpoint import CheckpointManager
step = CheckpointManager("runs/molecules_v6").latest_step() or 0
sys.exit(0 if step > 0 else 1)
PYEOF
then
  run molecules_v6_samples 4200 python experiments/sample_eval.py \
    --run runs/molecules_v6 --temperatures 1.0,0.85,0.7 --num_samples 1024

  run molecules_v6_diag 1800 python benchmarks/molecule_diagnostics.py \
    --run runs/molecules_v6 --num_samples 128
fi

run lm_bench_lstm 2400 python benchmarks/lm_bench.py --net lstm

run lm_v4_is128 3600 python experiments/eval_bpd.py \
  --run runs/lm_v4 --num_samples 128 --split test

echo "campaign18 complete"
