#!/bin/bash
# Round-4 TPU queue E: small evidence closers.
#   1. Re-run the ref-freq42-e200 cross-sample (10k x 1000) with
#      --save-samples: records the divergent-chain census for the
#      retrained reference corner (the seed-study table's "div /10k"
#      column) and double-checks reproducibility of the committed
#      results_cross_our_sampler.yaml.
#   2. Retry the batch-2048 sampling bench once (queue B's attempt hit
#      a TPU-worker crash; distinguish transient tunnel fault from a
#      real capacity limit).
# Logs: /tmp/r4q/queue.log.
set -u
cd /root/repo
Q=/tmp/r4q
mkdir -p "$Q"
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

step QUEUE4E START

step "cross-sample ref e200 retrain 10k x 1000 (divergence census)"
python -u scripts/cross_sample_reference_weights.py \
  --run runs_reference/ref-freq42-e200 --fourier \
  --num-samples 10000 --num-diffusion-steps 1000 \
  --sample-batch-size 512 --save-samples > "$Q/cross_ref_e200_census.log" 2>&1
step "cross-sample census rc=$?"
grep -h "divergent chains" "$Q/cross_ref_e200_census.log" || true
if [ -f runs_reference/ref-freq42-e200/samples_cross_our_sampler.npy ]; then
  qcommit "Record divergence census artifacts for the ref e200 cross-sample corner" \
    runs_reference/ref-freq42-e200/results_cross_our_sampler.yaml \
    runs_reference/ref-freq42-e200/samples_cross_our_sampler.npy || true
fi

step "bench b=2048 retry"
BENCH_BATCH=2048 python -u bench.py > "$Q/bench_scaling_b2048_retry.log" 2>&1
step "bench b=2048 retry rc=$?"
tail -1 "$Q/bench_scaling_b2048_retry.log" || true

step QUEUE4E DONE
