#!/bin/bash
# Snapshots the in-flight reference-retrain/sampling state every ~30 min so a
# machine wipe costs at most half an hour of single-core torch work (wipes
# have cost 14h twice already). Covers the training state AND the reference-
# sampler corner's resumable chunks (sample_chunks/*.pt + rng_state.pt).
#
# VERDICT r04 weak #3: snapshot commits used to land on main (32 commits,
# ~1.6 GB of a 1.9 GB .git). Snapshots now live on a dedicated ref,
# refs/snapshots/inflight, written with commit-tree through a TEMP INDEX —
# main history is never touched and each overwrite orphans the previous
# blob (refs/snapshots/* is not reflogged, so `git gc --prune=now` reclaims).
#
# Recover after a wipe with:
#   git restore --source refs/snapshots/inflight -- runs_reference/
#
# All git mutations take /tmp/fdiff_git.lock (shared with the TPU queue's
# qcommit and manual session commits) to avoid index races.
set -u
cd /root/repo
RUNS=(runs_reference/ref-freq42-e200 runs_reference/ref-freq43-e200
      runs_reference/ref-freq44-e200 runs_reference/ref-time42-e60
      runs_reference/ref-lstm-freq42-e60 runs_reference/ref-lstm-time42-e60)
while true; do
  sleep 1800
  PATHS=()
  for d in "${RUNS[@]}"; do
    [ -f "$d/train_state.pt" ] && PATHS+=("$d/train_state.pt")
    [ -d "$d/sample_chunks" ] && [ -n "$(ls -A "$d/sample_chunks" 2>/dev/null)" ] && \
      PATHS+=("$d/sample_chunks")
  done
  [ "${#PATHS[@]}" -gt 0 ] || continue
  flock /tmp/fdiff_git.lock bash -c '
    export GIT_INDEX_FILE=/tmp/fdiff_snap_index
    rm -f "$GIT_INDEX_FILE"
    git read-tree --empty
    git add -f "$@" 2>/dev/null
    TREE=$(git write-tree)
    PREV=$(git rev-parse -q --verify refs/snapshots/inflight^{tree} 2>/dev/null || true)
    if [ "$TREE" != "$PREV" ]; then
      C=$(git commit-tree "$TREE" -m "Snapshot in-flight reference retrain state")
      git update-ref --no-deref refs/snapshots/inflight "$C"
    fi
    rm -f "$GIT_INDEX_FILE"
  ' _ "${PATHS[@]}"
done
