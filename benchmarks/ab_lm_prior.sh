#!/bin/bash
# CPU A/B: logistic vs HMM latent prior on the tiny LM config.
# Decides lm_v6's --prior flags (campaign19 reads /tmp/lm_v6_prior_flags).
# Core-limited to 2 of the 4 host cores so the concurrent TPU campaign's
# host threads (data gen, dispatch) keep their share.
set -u
cd /root/repo
COMMON="--corpus synthetic --num_steps 2000 --eval_every 500
  --eval_samples 8 --batch_size 64 --seq_len 64 --hidden_dim 128
  --num_layers 2 --encoding_dim 4 --num_mixtures 8 --lr 1e-3
  --log_every 500 --seed 3"

# shellcheck disable=SC2086
CNF_PLATFORM=cpu taskset -c 0,1 python \
  experiments/language_modeling/train.py $COMMON \
  --prior logistic --out_dir runs_ab/lm_prior_base \
  > /tmp/ab_lm_prior_base.log 2>&1
echo "base done (exit $?)"

# shellcheck disable=SC2086
CNF_PLATFORM=cpu taskset -c 0,1 python \
  experiments/language_modeling/train.py $COMMON \
  --prior hmm --prior_states 32 --out_dir runs_ab/lm_prior_hmm \
  > /tmp/ab_lm_prior_hmm.log 2>&1
echo "hmm done (exit $?)"

python - <<'PYEOF'
import json
def best(run):
    rows = [json.loads(l) for l in open(f"runs_ab/{run}/metrics.jsonl")]
    vals = [r["bpd"] for r in rows if r.get("prefix") == "val"]
    fin = [r for r in rows if r.get("prefix") == "final"]
    return min(vals), (fin[-1] if fin else {})
b, bf = best("lm_prior_base")
h, hf = best("lm_prior_hmm")
print(f"base best val bpd {b:.4f}  final {bf}")
print(f"hmm  best val bpd {h:.4f}  final {hf}")
flags = ("--prior hmm --prior_states 32" if h < b + 0.005
         else "--prior logistic")
open("/tmp/lm_v6_prior_flags", "w").write(flags + "\n")
print("lm_v6 prior flags:", flags)
PYEOF
