#!/bin/bash
# Cross-WINDOW checkpoint persistence via git.
#
# ckpt_stash.sh persists checkpoints in ~/.cache, which survives a
# *workspace* reset but NOT the fresh-machine resets this round keeps
# hitting (round-3 windows 2 and 3 both came up with a base-image
# ~/.cache: molecules_v6@45k and the campaign24 queue were lost).  The
# git repo is the only artifact the driver carries across windows, so
# long trainings can only span windows if their resume state rides in a
# commit.
#
#   ckpt_bundle.sh stash <run>    tar+zstd the newest step_* dir of
#                                 checkpoints_last/ (resume state) and the
#                                 newest of checkpoints/ (best, for
#                                 sample_eval) into persist/<run>.tar.gz
#                                 and git-commit it (one file per run,
#                                 overwritten each window -> bounded bloat)
#   ckpt_bundle.sh restore <run>  if runs/<run> lacks any step_* dir,
#                                 untar the bundle back in place
#
# The architecture-compat check stays ckpt_stash.sh's job: restore here
# only unpacks files; the Trainer's resume guard still refuses a changed
# architecture.
#
# HISTORY-COST POLICY: every stash adds its full compressed size to git
# history forever (no LFS here; window 3 grew .git to ~2.5 GB with three
# bundles).  Stash a given run AT MOST once per window — at the end of
# its last completed chunk — and only when the step delta since the
# previous bundle buys >=1 h of next-window chip time.
set -euo pipefail
cd "${CNF_REPO:-/root/repo}"   # override for sandboxed tests
cmd=${1:?stash|restore}
run=${2:?run name}
bundle="persist/${run}.tar.gz"

newest_step() {  # newest complete step dir under $1, empty if none
  { find "$1" -maxdepth 1 -type d -name 'step_*' 2>/dev/null \
      | grep -E 'step_[0-9]{8}$' | sort | tail -1; } || true
}

case "$cmd" in
  stash)
    last=$(newest_step "runs/$run/checkpoints_last")
    best=$(newest_step "runs/$run/checkpoints")
    [ -n "$last$best" ] || { echo "no checkpoints for $run"; exit 1; }
    mkdir -p persist
    paths=()
    [ -n "$last" ] && paths+=("${last#./}")
    [ -n "$best" ] && [ "$best" != "$last" ] && paths+=("${best#./}")
    [ -f "runs/$run/config.json" ] && paths+=("runs/$run/config.json")
    tar -czf "$bundle.tmp" "${paths[@]}"
    mv "$bundle.tmp" "$bundle"
    du -h "$bundle"
    if [ -z "${CNF_BUNDLE_NO_GIT:-}" ]; then
      git add "$bundle"
      # Pathspec-scoped commit: campaign scripts stash while the tree is
      # dirty, so an unscoped commit would sweep staged unrelated changes
      # into the persist commit (ADVICE r3).
      git commit -q -m \
        "persist: $run resume bundle ($(basename "${last:-$best}"))" \
        -- "$bundle" \
        || echo "bundle unchanged"
    fi
    ;;
  restore)
    [ -f "$bundle" ] || { echo "no bundle for $run"; exit 0; }
    if [ -n "$(newest_step "runs/$run/checkpoints_last")$(newest_step "runs/$run/checkpoints")" ]; then
      echo "$run already has checkpoints; not overwriting"; exit 0
    fi
    # --skip-old-files: the step-dir guard above only covers checkpoints;
    # the tarball also carries runs/<run>/config.json, which must not
    # clobber a freshly re-configured run (ADVICE r3).
    tar -xzf "$bundle" --skip-old-files
    echo "restored $run from $bundle:"
    find "runs/$run" -maxdepth 2 -name 'step_*' -type d | sort
    ;;
  *) echo "usage: $0 stash|restore <run>"; exit 2 ;;
esac
