#!/bin/bash
# Third link of the campaign19 chain: the transformer-backbone LM run
# (scan-free attention training pass — the TPU-native backbone; was
# deferred to round 3 for window time).  Runs only after campaign19b
# exits and only if window remains; same prior gate as lm_v6.
#
# Usage: campaign19c.sh <campaign19b_pid>
set -u
cd /root/repo

B_PID=${1:?campaign19b pid}
while kill -0 "$B_PID" 2>/dev/null; do sleep 60; done
echo "campaign19b exited at $(date -u +%H:%M)"

secs_left() {
  local now tgt
  now=$(date -u +%s)
  tgt=$(date -u -d "23:45" +%s)
  echo $((tgt - now))
}
LEFT=$(secs_left)
if [ "$LEFT" -lt 1800 ]; then
  echo "only ${LEFT}s left; skipping lm_v7_tf"
  exit 0
fi

if ! timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
  echo "tunnel dark; skipping lm_v7_tf"
  exit 0
fi

LM_PRIOR_FLAGS=$(cat /tmp/lm_v6_prior_flags 2>/dev/null \
  || echo "--prior hmm --prior_states 32")
# shellcheck disable=SC2086
timeout "$LEFT" python experiments/language_modeling/train.py \
  --corpus synthetic --num_steps 30000 --eval_every 3000 --eval_samples 8 \
  --batch_size 128 --seq_len 256 --hidden_dim 512 --num_layers 4 \
  --net transformer --lstm_layers 2 \
  --encoding_dim 4 --num_mixtures 32 --lr 5e-4 $LM_PRIOR_FLAGS \
  --out_dir runs/lm_v7_tf --log_every 2000 --resume \
  > /tmp/campaign19c_lm_v7_tf.log 2>&1
echo "lm_v7_tf done (exit $?)"
tail -4 /tmp/campaign19c_lm_v7_tf.log

LEFT=$(secs_left)
if [ "$LEFT" -ge 900 ]; then
  timeout "$LEFT" python experiments/eval_bpd.py \
    --run runs/lm_v7_tf --num_samples 128 --split test \
    > /tmp/campaign19c_lm_v7_is128.log 2>&1
  echo "lm_v7_tf IS-128 done (exit $?)"
  tail -2 /tmp/campaign19c_lm_v7_is128.log
fi
