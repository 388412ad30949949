#!/bin/bash
# Round-4 watcher G: chains the CPU-bound reference work.
#   1. Wait for the in-flight torch ref-sampler corner (ref-freq42-e200,
#      5 x 200-sample chunks at 1000 steps) to finish; commit its
#      results.yaml (closes the full-budget triangle, VERDICT r03 #1a).
#   2. Retrain the reference recipe at seed 43 (e200, --skip-sampling),
#      commit model.pt/history, cross-sample census at 10k x 1000 on the
#      TPU (ref-trained divergence rate N=2, VERDICT r03 #1b).
#   3. Seed 44 likewise if the wall-clock deadline allows (N=3).
# Single-instance: refuses to start if /tmp/r4g.pid holds a live pid.
# Logs: /tmp/r4q/queue.log.
set -u
cd /root/repo
Q=/tmp/r4q
mkdir -p "$Q"

if [ -f /tmp/r4g.pid ] && kill -0 "$(cat /tmp/r4g.pid)" 2>/dev/null; then
  echo "watcher G already running (pid $(cat /tmp/r4g.pid)); refusing duplicate" >&2
  exit 1
fi
echo $$ > /tmp/r4g.pid

exec >> "$Q/queue.log" 2>&1

step() { echo "=== $(date '+%F %T') $*"; }

qcommit() {
  local msg=$1; shift
  for i in 1 2 3 4 5; do
    flock -w 60 /tmp/fdiff_git.lock bash -c \
      'msg=$1; shift; git add -f "$@" && git commit -q -m "$msg" -- "$@"' \
      _ "$msg" "$@" && return 0
    sleep 7
  done
  step "COMMIT FAILED: $msg"
  return 1
}

REF42=runs_reference/ref-freq42-e200
# Seed-44 arm starts only before this deadline (census itself is short).
DEADLINE=$(date -d '2026-08-19 10:30' +%s)

step "WATCHER4G START (corner pid $(cat /tmp/ref_retrain.pid 2>/dev/null || echo '?'))"

# ---- 1. corner completion ----
while ps -p "$(cat /tmp/ref_retrain.pid 2>/dev/null || echo 0)" >/dev/null 2>&1; do
  sleep 120
done
if [ -f "$REF42/results.yaml" ]; then
  step "corner COMPLETE: ref-freq42-e200 results.yaml present"
  qcommit "round 4: torch reference-sampler corner at 1000 x 1000 (triangle closed)" \
    "$REF42/results.yaml" "$REF42/run_config.yaml" || true
else
  step "corner process exited WITHOUT results.yaml — check $REF42/rerun.log"
fi

# ---- 2/3. ref-trained divergence rate, seeds 43 (and 44 if time) ----
for SEED in 43 44; do
  if [ "$SEED" = 44 ] && [ "$(date +%s)" -gt "$DEADLINE" ]; then
    step "SKIPPED seed 44 (past deadline)"
    break
  fi
  TAG=ref-freq${SEED}-e200
  REF=runs_reference/$TAG
  step "reference e200 retrain seed $SEED (--skip-sampling)"
  python -u scripts/reference_quality_run.py --tag "$TAG" --fourier \
    --epochs 200 --seed "$SEED" --skip-sampling \
    > "$Q/ref_s${SEED}_train.log" 2>&1
  step "ref seed $SEED train rc=$?"
  if [ ! -f "$REF/model.pt" ]; then
    step "SKIPPED seed $SEED census (no model.pt)"
    continue
  fi
  qcommit "round 4: reference e200 retrain seed $SEED (model.pt + history)" \
    "$REF/model.pt" "$REF/history.yaml" || true
  step "cross-sample census seed $SEED 10k x 1000"
  python -u scripts/cross_sample_reference_weights.py --run "$REF" \
    --fourier --num-samples 10000 --num-diffusion-steps 1000 \
    --sample-batch-size 512 --seed "$SEED" --save-samples \
    > "$Q/cross_ref_s${SEED}_census.log" 2>&1
  step "census seed $SEED rc=$?"
  grep -h "divergent chains" "$Q/cross_ref_s${SEED}_census.log" || true
  [ -f "$REF/results_cross_our_sampler.yaml" ] && \
    qcommit "round 4: ref e200 seed $SEED cross-sample census at 10k x 1000" \
      "$REF/results_cross_our_sampler.yaml" \
      "$REF/samples_cross_our_sampler.npy" || true
done

step WATCHER4G DONE
rm -f /tmp/r4g.pid
