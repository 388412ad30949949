#!/bin/bash
# Commits the in-flight reference-retrain state every ~30 min so a machine
# wipe costs at most half an hour of single-core retraining (it has cost
# 14h twice already). Commits ONLY the train_state.pt pathspec to avoid
# sweeping up unrelated staged work.
#
# ADVICE r03: successive snapshots used to stack ~51 MB binary commits
# (torch .pt files delta poorly). Now, when HEAD is itself a snapshot
# commit, the new state is amended into it, so at any time the branch
# carries at most one snapshot commit on top of the latest real commit.
# All git mutations take /tmp/fdiff_git.lock (shared with the TPU queue's
# qcommit and manual session commits) to avoid index races.
set -u
cd /root/repo
P=runs_reference/ref-freq42-e200/train_state.pt
MSG="Snapshot in-flight reference retrain state"
while true; do
  sleep 1800
  [ -f "$P" ] || continue
  if ! git diff --quiet -- "$P" || ! git ls-files --error-unmatch "$P" >/dev/null 2>&1; then
    flock /tmp/fdiff_git.lock bash -c '
      P=$0; MSG=$1
      git add -f "$P" 2>/dev/null
      if [ "$(git log -1 --pretty=%s)" = "$MSG" ]; then
        git commit -q --amend -m "$MSG" 2>/dev/null || true
      else
        git commit -q -m "$MSG" -- "$P" 2>/dev/null || true
      fi
    ' "$P" "$MSG"
  fi
done
