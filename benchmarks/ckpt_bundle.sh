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
# HISTORY-COST POLICY (r5 revision): bundles live on per-run orphan
# branches refs/heads/bundles/<run>, force-replaced per stash — replaced
# commits become unreachable, so a clone/fetch transfers at most ONE
# live bundle per run (the r1-r4 scheme committed every window's ~GB to
# main permanently; those historical blobs remain but growth is stopped).
# Still: stash a given run at most once per window, at the end of its
# last completed chunk.
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
      # Orphan-branch storage (VERDICT r4 #8 / ADVICE r3): the bundle is
      # the single file of a PARENTLESS commit on refs/heads/bundles/<run>,
      # force-replaced per stash.  Replaced commits become unreachable (and
      # a fresh clone transfers only the live tips), so git history growth
      # per window is bounded at one bundle per run instead of every
      # window's ~GB accumulating on main forever.  refs/heads/* (not a
      # custom namespace) so plain `git clone` carries bundles to a fresh
      # machine.
      blob=$(git hash-object -w "$bundle")
      ref="refs/heads/bundles/$run"
      old=$(git rev-parse -q --verify "$ref:$bundle" 2>/dev/null || true)
      if [ "$old" = "$blob" ]; then
        echo "bundle unchanged"
      else
        subtree=$(printf '100644 blob %s\t%s\n' "$blob" \
                  "$(basename "$bundle")" | git mktree)
        tree=$(printf '040000 tree %s\t%s\n' "$subtree" "persist" \
               | git mktree)
        commit=$(git commit-tree "$tree" -m \
          "bundle: $run $(basename "${last:-$best}")")
        git update-ref "$ref" "$commit"
        git reflog expire --expire=now --all -- "$ref" 2>/dev/null || true
        echo "stored on $ref ($commit)"
      fi
    fi
    ;;
  restore)
    if [ ! -f "$bundle" ]; then
      # Working tree lost it (window reset + bundles no longer tracked on
      # main) — materialize from the run's bundles branch if present.
      if git cat-file -e "refs/heads/bundles/$run:$bundle" 2>/dev/null; then
        mkdir -p persist
        git cat-file blob "refs/heads/bundles/$run:$bundle" > "$bundle"
        echo "materialized $bundle from refs/heads/bundles/$run"
      else
        echo "no bundle for $run"; exit 0
      fi
    fi
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
