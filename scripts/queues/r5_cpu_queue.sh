#!/bin/bash
# Round-5 CPU queue (single-core torch work, strictly serial):
#   1. Reference e200 retrain seed 44 (--skip-sampling) -> commit
#      model.pt/history -> 10k x 1000 cross-sample census on the TPU
#      (reference divergence-rate arm N=3, VERDICT r04 missing #1).
#   2. Regenerate the three e60 reference model.pt files lost pre-
#      gitignore-fix (VERDICT r04 weak #5 / next #8): retrain each at
#      the committed run_config.yaml settings, verify the regenerated
#      history.yaml is bit-identical to the committed one, commit
#      model.pt so every runs_reference/ row reproduces from a clone.
# Single-instance: refuses to start if /tmp/r5cpu.pid holds a live pid.
# TPU jobs take /tmp/fdiff_tpu.lock so they never overlap the round-5
# TPU queue. Logs: /tmp/r5q/queue.log.
set -u
cd /root/repo
Q=/tmp/r5q
mkdir -p "$Q"

if [ -f /tmp/r5cpu.pid ] && kill -0 "$(cat /tmp/r5cpu.pid)" 2>/dev/null; then
  echo "r5 cpu queue already running (pid $(cat /tmp/r5cpu.pid)); refusing duplicate" >&2
  exit 1
fi
echo $$ > /tmp/r5cpu.pid

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

step "R5 CPU QUEUE START"

# ---- 1. seed-44 reference retrain + census ----
SEED=44
TAG=ref-freq${SEED}-e200
REF=runs_reference/$TAG
if [ -f "$REF/results_cross_our_sampler.yaml" ]; then
  step "seed $SEED census already present; skipping arm"
else
  step "reference e200 retrain seed $SEED (--skip-sampling)"
  python -u scripts/reference_quality_run.py --tag "$TAG" --fourier \
    --epochs 200 --seed "$SEED" --skip-sampling \
    > "$Q/ref_s${SEED}_train.log" 2>&1
  step "ref seed $SEED train rc=$?"
  if [ -f "$REF/model.pt" ]; then
    qcommit "round 5: reference e200 retrain seed $SEED (model.pt + history)" \
      "$REF/model.pt" "$REF/history.yaml" || true
    step "cross-sample census seed $SEED 10k x 1000 (waits on TPU lock)"
    flock /tmp/fdiff_tpu.lock \
      python -u scripts/cross_sample_reference_weights.py --run "$REF" \
        --fourier --num-samples 10000 --num-diffusion-steps 1000 \
        --sample-batch-size 512 --seed "$SEED" --save-samples \
        > "$Q/cross_ref_s${SEED}_census.log" 2>&1
    step "census seed $SEED rc=$?"
    grep -h "divergence_census" "$REF/results_cross_our_sampler.yaml" 2>/dev/null || true
    [ -f "$REF/results_cross_our_sampler.yaml" ] && \
      qcommit "round 5: ref e200 seed $SEED cross-sample census at 10k x 1000" \
        "$REF/results_cross_our_sampler.yaml" \
        "$REF/samples_cross_our_sampler.npy" || true
  else
    step "SKIPPED seed $SEED census (no model.pt)"
  fi
fi

# ---- 2. e60 model.pt regens (audit-chain closure) ----
regen_e60() {
  local tag=$1 model=$2 fourier_flag=$3
  local ref=runs_reference/$tag
  if [ -f "$ref/model.pt" ]; then
    step "$tag model.pt already present; skipping"
    return 0
  fi
  step "e60 regen $tag (model=$model fourier=${fourier_flag:-no})"
  cp "$ref/history.yaml" "$Q/${tag}_history_committed.yaml"
  cp "$ref/run_config.yaml" "$Q/${tag}_run_config_committed.yaml" 2>/dev/null || true
  # shellcheck disable=SC2086
  python -u scripts/reference_quality_run.py --tag "$tag" --model "$model" \
    $fourier_flag --epochs 60 --seed 42 --skip-sampling \
    > "$Q/${tag}_regen.log" 2>&1
  step "$tag regen rc=$?"
  [ -f "$ref/model.pt" ] || { step "$tag regen FAILED (no model.pt)"; return 1; }
  if cmp -s "$ref/history.yaml" "$Q/${tag}_history_committed.yaml"; then
    step "$tag history.yaml BIT-IDENTICAL to committed — audit chain closed"
    qcommit "round 5: regenerate $tag model.pt (history bit-identical to committed)" \
      "$ref/model.pt" || true
    # restore any cosmetically-rewritten tracked files (run_config.yaml)
    flock -w 60 /tmp/fdiff_git.lock git restore "$ref" 2>/dev/null || true
  else
    step "$tag history.yaml DIFFERS from committed — committing both for inspection"
    qcommit "round 5: regenerate $tag model.pt (history DIFFERS from committed run; see queue log)" \
      "$ref/model.pt" "$ref/history.yaml" || true
  fi
  rm -f "$ref/train_state.pt"
}

regen_e60 ref-time42-e60 transformer ""
regen_e60 ref-lstm-freq42-e60 lstm "--fourier"
regen_e60 ref-lstm-time42-e60 lstm ""

step "R5 CPU QUEUE DONE"
rm -f /tmp/r5cpu.pid
