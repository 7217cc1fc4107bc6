#!/bin/bash
# Follow-on to campaign19: per-stage temperature sweep on molecules_v6
# (the knob landed mid-window, after the controller started — a running
# bash script must never be edited in place, so the sweep rides a second
# controller that waits for the first to exit).
#
# Sweep design (diagnostics-driven): fragmentation = too few edges →
# t_exist both directions; double-bond undersampling (mode collapse
# toward the majority class) → t_bond ABOVE 1 spreads bond-type draws;
# valence excess → t_node below 1. 1024 samples/token, one compiled
# executable for the whole sweep (temperature is traced).
#
# Usage: campaign19b.sh <controller_pid>
set -u
cd /root/repo

CTRL_PID=${1:?controller pid}
while kill -0 "$CTRL_PID" 2>/dev/null; do sleep 60; done
echo "controller $CTRL_PID exited at $(date -u +%H:%M)"

now_hm=$(date -u +%H%M)
if [ "$((10#$now_hm))" -ge 2330 ]; then
  echo "window closed; skipping stage sweep"
  exit 0
fi

if ! timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
  echo "tunnel dark; skipping stage sweep"
  exit 0
fi

python - <<'PYEOF'
import sys
sys.path.insert(0, ".")
from categoricalnf_tpu.training.checkpoint import CheckpointManager
step = CheckpointManager("runs/molecules_v6").latest_step() or 0
sys.exit(0 if step > 0 else 1)
PYEOF
if [ $? -ne 0 ]; then
  echo "no molecules_v6 checkpoint; skipping"
  exit 0
fi

timeout 4800 python experiments/sample_eval.py --run runs/molecules_v6 \
  --temperatures "1.0:0.85:1.0,1.0:1.15:1.0,1.0:1.0:1.2,0.85:1.0:1.2,0.85:0.85:1.1,0.7:0.85:1.2" \
  --num_samples 1024 > /tmp/campaign19b_stage_sweep.log 2>&1
echo "stage sweep done (exit $?)"
tail -8 /tmp/campaign19b_stage_sweep.log
