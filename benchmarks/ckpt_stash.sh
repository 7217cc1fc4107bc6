#!/bin/bash
# Stash/restore run checkpoints across driver workspace resets.
#
# The driver resets /root/repo to git state between windows, wiping the
# gitignored runs/*/checkpoints{,_last}/ — but $HOME/.cache survives (the
# compile cache ~/.cache/cnf_jax proved it).  Stashing the latest
# checkpoints there lets the next window RESUME long trainings
# (molecules needs ~100k steps; a window yields ~10k) instead of
# restarting fresh every time, which round 2 did three times.
#
# ADVICE r2 fixes:
#   - stash excludes incomplete *.orbax-checkpoint-tmp-* dirs (a KILLed
#     save must not poison the stash) and anything not ^step_\d{8}$;
#   - restore compares the LATEST step between stash and dest and takes
#     the newer side (previously it silently skipped when the dest
#     existed, even stale, while still printing "restored");
#   - the config mismatch check compares only ARCHITECTURE keys, not
#     runtime knobs like eval_every/num_steps/lr.
#
# Usage:
#   ckpt_stash.sh stash   <run_name>   # runs/<run_name> -> ~/.cache
#   ckpt_stash.sh restore <run_name>   # ~/.cache -> runs/<run_name>
set -eu
# CNF_REPO/CNF_STASH overrides exist for the sandboxed test
# (tests/test_ckpt_stash.py); production uses the defaults.
cd "${CNF_REPO:-/root/repo}"
STASH="${CNF_STASH:-$HOME/.cache/cnf_ckpts}"
op=$1; run=$2

# Newest complete checkpoint step in a dir (empty if none).
latest_step() {
  local d=$1
  [ -d "$d" ] || { echo ""; return; }
  ls "$d" 2>/dev/null | grep -E '^step_[0-9]{8}$' | sort | tail -1
}

# Architecture compare of two run configs: runtime-only keys are free to
# change, and keys present in only ONE config (a flag added between
# sessions — the other side trained with its default) don't refuse.
arch_match() {
  python3 - "$1" "$2" <<'EOF'
import json, sys
RUNTIME = {"num_steps", "eval_every", "eval_samples", "log_every",
           "out_dir", "resume", "lr", "grad_clip", "batch_size",
           "beta_end", "beta_warmup", "seed", "steps_per_call"}
a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
if a.get("task") != b.get("task"):
    sys.exit(1)
aa, ba = a.get("args", {}), b.get("args", {})
keys = (set(aa) & set(ba)) - RUNTIME
sys.exit(0 if all(aa[k] == ba[k] for k in keys) else 1)
EOF
}

case "$op" in
  stash)
    for sub in checkpoints checkpoints_last; do
      src="runs/$run/$sub"
      if [ -d "$src" ] && ls "$src" | grep -qE '^step_[0-9]{8}$'; then
        rm -rf "$STASH/$run/$sub"
        mkdir -p "$STASH/$run/$sub"
        for d in "$src"/*; do
          base=$(basename "$d")
          if echo "$base" | grep -qE '^step_[0-9]{8}$'; then
            cp -r "$d" "$STASH/$run/$sub/$base"
          fi
        done
      fi
    done
    # config.json pins the architecture the checkpoint belongs to; the
    # restore path refuses an architecture mismatch.
    [ -f "runs/$run/config.json" ] \
      && cp "runs/$run/config.json" "$STASH/$run/config.json"
    du -sh "$STASH/$run" 2>/dev/null || echo "nothing stashed for $run"
    ;;
  restore)
    if [ ! -d "$STASH/$run" ]; then
      echo "no stash for $run"; exit 1
    fi
    if [ -f "$STASH/$run/config.json" ] && [ -f "runs/$run/config.json" ]; then
      if ! arch_match "$STASH/$run/config.json" "runs/$run/config.json"; then
        echo "ARCHITECTURE mismatch: stash vs runs/$run — refusing restore"
        exit 1
      fi
    fi
    mkdir -p "runs/$run"
    for sub in checkpoints checkpoints_last; do
      s_step=$(latest_step "$STASH/$run/$sub")
      d_step=$(latest_step "runs/$run/$sub")
      if [ -n "$s_step" ] && [ "$s_step" \> "$d_step" ]; then
        rm -rf "runs/$run/$sub"
        cp -r "$STASH/$run/$sub" "runs/$run/$sub"
        echo "  $sub: stash $s_step > dest ${d_step:-none} — restored"
      else
        echo "  $sub: dest ${d_step:-none} >= stash ${s_step:-none} — kept"
      fi
    done
    echo "restored $run: $(find "runs/$run" -maxdepth 2 -name 'step_*' \
      -type d | sort | tail -2 | tr '\n' ' ')"
    ;;
  *) echo "usage: $0 {stash|restore} <run_name>"; exit 2 ;;
esac
