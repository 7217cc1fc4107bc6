#!/bin/bash
# Round-2 (third window) queue — replaces campaign18's controller, which
# never got a TPU window (tunnel dark 23:14 Aug 17 → past the 22:45 cap).
#
# Window restarted ~14:45 UTC Aug 18; tunnel verified healthy 15:12.
# Order: coloring 75k resume (quick verdict item, ~36 min at 23 steps/s)
# → 1024-sample temp sweep → molecules_v6 FRESH with the replicated
# winning lever pair (node_cond_atoms + bond_cond_degree: 73.9→81.1 seed
# 3, 77.9→81.5 seed 7) → sample sweep + diagnostics → lm_v6 (4 blocks,
# K=32, 20M-char corpus, and the HMM latent prior that the exact gap
# decomposition targets — flow deficit 0.244 of the 0.257 gap; the prior
# choice is vetoable via /tmp/lm_v6_prior_flags, written by the CPU A/B
# running alongside) → IS-128 bounds → lm_bench → molecules_v6 resume
# fills whatever window remains.  Every stage is probe-gated and
# checkpointed; nothing is lost to preemption.
#
# Usage: campaign19.sh
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

GLOBAL_CUT="23:45"

run() {
  name=$1; tmo=$2; shift 2
  tmo=$(cap_at "$tmo" "$GLOBAL_CUT")
  if [ "$tmo" -lt 300 ]; then
    echo "=== $name SKIPPED (window $tmo s too small) ==="
    return
  fi
  wait_tpu
  tmo=$(cap_at "$tmo" "$GLOBAL_CUT")   # re-cap: probing may have eaten hours
  if [ "$tmo" -lt 300 ]; then
    echo "=== $name SKIPPED post-probe (window too small) ==="
    return
  fi
  echo "=== $name: timeout $tmo $* ==="
  timeout "$tmo" "$@" > "/tmp/campaign19_${name}.log" 2>&1
  echo "=== $name done (exit $?) ==="
  tail -4 "/tmp/campaign19_${name}.log"
}

have_ckpt() {
  python - "$1" <<'PYEOF'
import sys
sys.path.insert(0, ".")
from categoricalnf_tpu.training.checkpoint import CheckpointManager
step = CheckpointManager(sys.argv[1]).latest_step() or 0
sys.exit(0 if step > 0 else 1)
PYEOF
}

# 1. Coloring 75k (VERDICT r1 #5) — short, finishes a verdict item.
if ! grep -q '"step": 75000' runs/coloring/metrics.jsonl 2>/dev/null; then
  run coloring_75k 5400 python experiments/graph_coloring/train.py \
    --num_steps 75000 --eval_every 5000 --eval_samples 8 \
    --out_dir runs/coloring --log_every 2000 --resume
fi

run coloring_samples 3000 python experiments/sample_eval.py \
  --run runs/coloring --temperatures 1.0,0.85,0.7 --num_samples 1024

# 2. Molecules (VERDICT r1 #1 / top_next): fresh molecules_v6 with the
#    seed-replicated winning lever pair on the v5 architecture.
MOL_TMO=$(cap_at 99999 "19:45")
run molecules_v6 "$MOL_TMO" \
  python experiments/molecule_generation/train.py \
  --dataset zinclike250k --data_dir data --max_nodes 24 \
  --num_steps 100000 --eval_every 5000 --eval_samples 4 --batch_size 192 \
  --hidden_dim 256 --num_layers_node 6 --num_layers_edge 8 \
  --num_mixtures 16 --node_cond_atoms --bond_cond_degree \
  --out_dir runs/molecules_v6 --log_every 2000 --resume

if have_ckpt runs/molecules_v6; then
  run molecules_v6_samples 4200 python experiments/sample_eval.py \
    --run runs/molecules_v6 --temperatures 1.0,0.85,0.7 --num_samples 1024

  run molecules_v6_diag 1800 python benchmarks/molecule_diagnostics.py \
    --run runs/molecules_v6 --num_samples 128
fi

# 3. LM gap push (VERDICT r1 #2): 4 blocks, K=32, 20M-char corpus, and
#    the latent prior chosen by the structural diagnosis (HMM) unless
#    the concurrent CPU A/B vetoes it via /tmp/lm_v6_prior_flags.
LM_PRIOR_FLAGS=$(cat /tmp/lm_v6_prior_flags 2>/dev/null \
  || echo "--prior hmm --prior_states 32")
LM_TMO=$(cap_at 10800 "22:30")
# shellcheck disable=SC2086
run lm_v6 "$LM_TMO" python experiments/language_modeling/train.py \
  --corpus synthetic --num_steps 30000 --eval_every 3000 --eval_samples 8 \
  --batch_size 128 --seq_len 256 --hidden_dim 512 --num_layers 4 \
  --encoding_dim 4 --num_mixtures 32 --lr 5e-4 $LM_PRIOR_FLAGS \
  --out_dir runs/lm_v6 --log_every 2000 --resume

if have_ckpt runs/lm_v6; then
  run lm_v6_is128 3600 python experiments/eval_bpd.py \
    --run runs/lm_v6 --num_samples 128 --split test
fi

run lm_bench_lstm 2400 python benchmarks/lm_bench.py --net lstm

run lm_v4_is128 3600 python experiments/eval_bpd.py \
  --run runs/lm_v4 --num_samples 128 --split test

# 4. Whatever window remains goes back into the molecule run (the
#    top_next item benefits most from every extra step), then re-sample.
MOL_TMO2=$(cap_at 99999 "$GLOBAL_CUT")
if [ "$MOL_TMO2" -ge 1200 ] && have_ckpt runs/molecules_v6; then
  run molecules_v6_more "$MOL_TMO2" \
    python experiments/molecule_generation/train.py \
    --dataset zinclike250k --data_dir data --max_nodes 24 \
    --num_steps 100000 --eval_every 5000 --eval_samples 4 \
    --batch_size 192 --hidden_dim 256 --num_layers_node 6 \
    --num_layers_edge 8 --num_mixtures 16 --node_cond_atoms \
    --bond_cond_degree --out_dir runs/molecules_v6 --log_every 2000 \
    --resume
  run molecules_v6_resample 4200 python experiments/sample_eval.py \
    --run runs/molecules_v6 --temperatures 1.0,0.85,0.7 --num_samples 1024
fi

echo "campaign19 complete"
