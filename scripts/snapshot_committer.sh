#!/bin/bash
# Commits the in-flight reference-retrain/sampling state every ~30 min so a
# machine wipe costs at most half an hour of single-core torch work (wipes
# have cost 14h twice already). Covers the training state AND the reference-
# sampler corner's resumable chunks (sample_chunks/*.pt + rng_state.pt).
#
# ADVICE r03: successive snapshots used to stack ~51 MB binary commits
# (torch .pt files delta poorly). When HEAD is itself a snapshot commit,
# the new state is amended into it, so at any time the branch carries at
# most one snapshot commit on top of the latest real commit.
# All git mutations take /tmp/fdiff_git.lock (shared with the TPU queue's
# qcommit and manual session commits) to avoid index races.
set -u
cd /root/repo
RUNS=(runs_reference/ref-freq42-e200 runs_reference/ref-freq43-e200 runs_reference/ref-freq44-e200)
MSG="Snapshot in-flight reference retrain state"
while true; do
  sleep 1800
  PATHS=()
  for d in "${RUNS[@]}"; do
    [ -f "$d/train_state.pt" ] && PATHS+=("$d/train_state.pt")
    [ -d "$d/sample_chunks" ] && [ -n "$(ls -A "$d/sample_chunks" 2>/dev/null)" ] && \
      PATHS+=("$d/sample_chunks")
  done
  [ "${#PATHS[@]}" -gt 0 ] || continue
  # Anything new or modified under the snapshot pathspecs?
  if [ -n "$(git status --porcelain -- "${PATHS[@]}")" ]; then
    flock /tmp/fdiff_git.lock bash -c '
      MSG=$0; shift
      git add -f "$@" 2>/dev/null
      if git diff --cached --quiet; then exit 0; fi
      if [ "$(git log -1 --pretty=%s)" = "$MSG" ]; then
        git commit -q --amend -m "$MSG" 2>/dev/null || true
      else
        git commit -q -m "$MSG" -- "$@" 2>/dev/null || true
      fi
    ' "$MSG" "${PATHS[@]}"
  fi
done
