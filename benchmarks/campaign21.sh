#!/bin/bash
# Next-window queue (written during the round-2 fourth window).
#
# New capability this exploits: benchmarks/ckpt_stash.sh persists run
# checkpoints in ~/.cache across the driver's workspace resets, so long
# trainings finally ACCUMULATE across windows.  The fourth window
# stashed molecules_v6 (lever pair node_cond_atoms+bond_cond_degree) at
# its timeout step; this window restores and resumes it for the bulk of
# the TPU time, then re-runs the 1024-sample sweep + diagnostics and
# re-stashes.  The LM stage runs only if the CPU A/B elected a prior
# (flag file stashed in ~/.cache/cnf_ckpts/lm_v6_prior_flags; absent =
# logistic).  Engine now handles SIGTERM gracefully (final metrics +
# last checkpoint on timeout), so `timeout` is given a 600 s grace
# before KILL and stage budgets assume the final phase runs inside it.
set -u
cd /root/repo

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name: timeout $tmo $(date -u +%H:%M) ==="
  timeout -k 600 "$tmo" "$@" > "/tmp/campaign21_${name}.log" 2>&1
  echo "=== $name done (exit $?) $(date -u +%H:%M) ==="
  tail -3 "/tmp/campaign21_${name}.log"
}

# 0. Datasets (wiped by the reset) + checkpoint stash restore.
python experiments/molecule_generation/preprocess.py --synthetic 250000 \
  --style zinc_like --name zinclike250k --out_dir data --max_nodes 24 \
  > /tmp/campaign21_prep.log 2>&1
bash benchmarks/ckpt_stash.sh restore molecules_v6 || true

# 1. Molecules: resume toward 100k.  ~7.5 steps/s -> budget the window's
#    bulk here; SIGTERM at timeout triggers the in-process final phase
#    (1024-sample metrics + test eval) within the KILL grace.
run molecules_v6_resume 2100 \
  python experiments/molecule_generation/train.py \
  --dataset zinclike250k --data_dir data --max_nodes 24 \
  --num_steps 100000 --eval_every 2500 --eval_samples 4 --batch_size 192 \
  --hidden_dim 256 --num_layers_node 6 --num_layers_edge 8 \
  --num_mixtures 16 --node_cond_atoms --bond_cond_degree \
  --out_dir runs/molecules_v6 --log_every 1000 --resume

bash benchmarks/ckpt_stash.sh stash molecules_v6

run molecules_v6_samples 720 python experiments/sample_eval.py \
  --run runs/molecules_v6 --temperatures 1.0,0.85,0.7 --num_samples 1024

run molecules_v6_diag 420 python benchmarks/molecule_diagnostics.py \
  --run runs/molecules_v6 --num_samples 128

# 2. LM: only with a validated prior verdict from the CPU A/B.
LM_FLAGS_FILE="$HOME/.cache/cnf_ckpts/lm_v6_prior_flags"
LM_PRIOR_FLAGS=$(cat "$LM_FLAGS_FILE" 2>/dev/null || echo "--prior logistic")
bash benchmarks/ckpt_stash.sh restore lm_v6 || true
# shellcheck disable=SC2086
run lm_v6 1800 python experiments/language_modeling/train.py \
  --corpus synthetic --num_steps 30000 --eval_every 3000 --eval_samples 8 \
  --batch_size 128 --seq_len 256 --hidden_dim 512 --num_layers 4 \
  --encoding_dim 4 --num_mixtures 32 --lr 5e-4 $LM_PRIOR_FLAGS \
  --out_dir runs/lm_v6 --log_every 2000 --resume
bash benchmarks/ckpt_stash.sh stash lm_v6

echo "campaign21 complete"
