#!/bin/bash
# Round-2 campaign (v4): transformer-backbone LM run (the TPU-native causal
# backbone — scan-free attention density pass) against the same synthetic
# Markov beacon as lm_v3/v4, targeting VERDICT #2's gap <= 0.05 bits.
# Runs after the campaign7 queue releases the TPU.
set -u
cd /root/repo

if [ $# -ge 1 ] && [ -n "$1" ]; then
  echo "waiting for pid $1 to release the TPU..."
  tail --pid="$1" -f /dev/null
fi

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name: $* ==="
  timeout "$tmo" "$@" > "/tmp/campaign8_${name}.log" 2>&1
  echo "=== $name done (exit $?) ==="
  tail -4 "/tmp/campaign8_${name}.log"
}

run lm_v5_tf 9000 python experiments/language_modeling/train.py \
  --corpus synthetic --net transformer --num_steps 50000 --eval_every 5000 \
  --eval_samples 8 --batch_size 128 --seq_len 256 --hidden_dim 384 \
  --lstm_layers 2 --num_layers 3 --encoding_dim 4 --num_mixtures 16 \
  --lr 5e-4 --out_dir runs/lm_v5_tf --log_every 2000

echo "campaign8 complete"
