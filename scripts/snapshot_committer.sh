#!/bin/bash
# Commits the in-flight reference-retrain state every ~30 min so a machine
# wipe costs at most half an hour of single-core retraining (it has cost
# 14h twice already). Commits ONLY the train_state.pt pathspec to avoid
# sweeping up unrelated staged work.
set -u
cd /root/repo
P=runs_reference/ref-freq42-e200/train_state.pt
while true; do
  sleep 1800
  [ -f "$P" ] || continue
  if ! git diff --quiet -- "$P" || ! git ls-files --error-unmatch "$P" >/dev/null 2>&1; then
    git add -f "$P" 2>/dev/null
    git commit -q -m "Snapshot in-flight reference retrain state" -- "$P" 2>/dev/null || true
  fi
done
