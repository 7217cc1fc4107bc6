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
# Usage:
#   ckpt_stash.sh stash   <run_name>   # runs/<run_name> -> ~/.cache
#   ckpt_stash.sh restore <run_name>   # ~/.cache -> runs/<run_name>
set -eu
cd /root/repo
STASH="$HOME/.cache/cnf_ckpts"
op=$1; run=$2

case "$op" in
  stash)
    for sub in checkpoints checkpoints_last; do
      src="runs/$run/$sub"
      if [ -d "$src" ] && [ -n "$(ls -A "$src" 2>/dev/null)" ]; then
        rm -rf "$STASH/$run/$sub"
        mkdir -p "$STASH/$run"
        cp -r "$src" "$STASH/$run/$sub"
      fi
    done
    # config.json pins the architecture the checkpoint belongs to; the
    # restore path refuses a mismatch rather than loading garbage.
    [ -f "runs/$run/config.json" ] \
      && cp "runs/$run/config.json" "$STASH/$run/config.json"
    du -sh "$STASH/$run" 2>/dev/null || echo "nothing stashed for $run"
    ;;
  restore)
    if [ ! -d "$STASH/$run" ]; then
      echo "no stash for $run"; exit 1
    fi
    if [ -f "$STASH/$run/config.json" ] \
        && [ -f "runs/$run/config.json" ] \
        && ! cmp -s "$STASH/$run/config.json" "runs/$run/config.json"; then
      echo "config mismatch: stash vs runs/$run — refusing restore"
      exit 1
    fi
    mkdir -p "runs/$run"
    for sub in checkpoints checkpoints_last; do
      if [ -d "$STASH/$run/$sub" ] \
          && [ ! -d "runs/$run/$sub" ]; then
        cp -r "$STASH/$run/$sub" "runs/$run/$sub"
      fi
    done
    echo "restored $run: $(find "runs/$run" -maxdepth 2 -name 'step_*' \
      -type d | sort | tail -2 | tr '\n' ' ')"
    ;;
  *) echo "usage: $0 {stash|restore} <run_name>"; exit 2 ;;
esac
