#!/bin/bash
# Round-4 TPU queue. Serializes all real-chip jobs for the round
# (one chip; CPU is owned by the torch reference retrain + chained
# ref-sampler corner). Priority order, highest value first so an early
# round end still lands the big items (VERDICT r03 "Next round" 2/3/6/9):
#   1. flagship f600 train (fixed ckpt-step code) + 10k x 1000 sampling
#      with checkpoint=best and =last; orbax ckpts committed (wipe-proof).
#   2. fast512 f600 train via the productized score_model=fast512 config
#      + 1k sanity + 10k best/last.
#   3. LSTM sampling bench (honest backbone perf row).
#   4. per-chip batch-scaling sweep 256/1024/2048 (512 = headline bench).
#   5. once the ref e200 retrain writes model.pt: cross-sample it with our
#      fused sampler at the published 10k x 1000 protocol (retrain
#      equivalence + ref-trained divergence datapoint), bounded wait.
#   6. final default bench (also measures fast512 now) — warms the
#      persistent compile cache (.jax_cache) for the driver's bench.
# ADVICE r03 fixes: every train/sample logs rc; failed trains emit an
# explicit SKIPPED line; sampling arms copy only train_config.yaml and
# symlink checkpoints (no 3x orbax duplication), with rm -rf first so
# reruns are idempotent.
# Logs: /tmp/r4q/queue.log (+ per-step logs alongside).
set -u
cd /root/repo
Q=/tmp/r4q
mkdir -p "$Q"
exec >> "$Q/queue.log" 2>&1

step() { echo "=== $(date '+%F %T') $*"; }

# Commit under the shared git lock (the snapshot committer amends HEAD
# when HEAD is a snapshot commit; serializing avoids index races).
qcommit() {
  local msg=$1; shift
  for i in 1 2 3 4 5; do
    flock -w 60 /tmp/fdiff_git.lock bash -c \
      'msg=$0; shift; git add -f "$@" && git commit -q -m "$msg" -- "$@"' \
      "$msg" "$@" && return 0
    sleep 7
  done
  step "COMMIT FAILED: $msg"
  return 1
}

# Sampling arm dir: train_config.yaml copy + checkpoints symlink.
mk_arm() {
  local src=$1 dst=$2
  rm -rf "runs/$dst"
  mkdir -p "runs/$dst"
  cp "runs/$src/train_config.yaml" "runs/$dst/"
  ln -s "$(pwd)/runs/$src/checkpoints" "runs/$dst/checkpoints"
}

train_and_10k() {  # <tag> <train overrides...>
  local tag=$1; shift
  step "train $tag f600"
  fdiff-train "$@" > "$Q/${tag}_train.log" 2>&1
  local rc=$?
  step "train $tag rc=$rc"
  local rid
  rid=$(grep -oE 'run_id=[a-z0-9]+' "$Q/${tag}_train.log" | tail -1 | cut -d= -f2)
  if [ -z "$rid" ] || [ ! -d "runs/$rid" ]; then
    step "SKIPPED ($tag train failed: no run_id)"
    return 1
  fi
  step "$tag run_id=$rid"
  qcommit "round 4: $tag f600 checkpoint ($rid)" \
    "runs/$rid/checkpoints" "runs/$rid/train_config.yaml" \
    "runs/$rid/metrics.jsonl" || true
  for ckpt in best last; do
    step "$tag 10k ckpt=$ckpt"
    mk_arm "$rid" "${rid}_10k_$ckpt"
    fdiff-sample "model_id=${rid}_10k_$ckpt" num_samples=10000 \
      "checkpoint=$ckpt" sampler.sample_batch_size=512 \
      > "$Q/${tag}_10k_$ckpt.log" 2>&1
    step "$tag 10k ckpt=$ckpt rc=$?"
    [ -f "runs/${rid}_10k_$ckpt/results.yaml" ] && \
      qcommit "round 4: $tag 10k $ckpt results ($rid)" \
        "runs/${rid}_10k_$ckpt/results.yaml" || true
  done
  echo "$rid" > "$Q/${tag}_rid"
}

step QUEUE4 START

# ---- 1. flagship f600 + 10k protocol ----
train_and_10k flagship datamodule=synthetic fourier_transform=true \
  trainer.max_epochs=600 trainer.ema_decay=0.999 \
  trainer.save_last_every_n=10 \
  trainer.callbacks.sampling.enabled=false

# ---- 2. fast512 f600 (productized config) + 1k sanity + 10k ----
step "train fast512 f600"
fdiff-train datamodule=synthetic fourier_transform=true \
  trainer.max_epochs=600 trainer.ema_decay=0.999 \
  trainer.save_last_every_n=10 score_model=fast512 \
  trainer.callbacks.sampling.enabled=false > "$Q/fast512_train.log" 2>&1
step "train fast512 rc=$?"
RID2=$(grep -oE 'run_id=[a-z0-9]+' "$Q/fast512_train.log" | tail -1 | cut -d= -f2)
if [ -z "${RID2}" ] || [ ! -d "runs/$RID2" ]; then
  step "SKIPPED (fast512 train failed: no run_id)"
else
  step "fast512 run_id=$RID2"
  qcommit "round 4: fast512 f600 checkpoint ($RID2)" \
    "runs/$RID2/checkpoints" "runs/$RID2/train_config.yaml" \
    "runs/$RID2/metrics.jsonl" || true
  step "fast512 1k sanity"
  mk_arm "$RID2" "${RID2}_1k"
  fdiff-sample "model_id=${RID2}_1k" num_samples=1000 \
    sampler.sample_batch_size=512 > "$Q/fast512_1k.log" 2>&1
  step "fast512 1k rc=$?"
  [ -f "runs/${RID2}_1k/results.yaml" ] && \
    qcommit "round 4: fast512 1k sanity results ($RID2)" \
      "runs/${RID2}_1k/results.yaml" || true
  for ckpt in best last; do
    step "fast512 10k ckpt=$ckpt"
    mk_arm "$RID2" "${RID2}_10k_$ckpt"
    fdiff-sample "model_id=${RID2}_10k_$ckpt" num_samples=10000 \
      "checkpoint=$ckpt" sampler.sample_batch_size=512 \
      > "$Q/fast512_10k_$ckpt.log" 2>&1
    step "fast512 10k ckpt=$ckpt rc=$?"
    [ -f "runs/${RID2}_10k_$ckpt/results.yaml" ] && \
      qcommit "round 4: fast512 10k $ckpt results ($RID2)" \
        "runs/${RID2}_10k_$ckpt/results.yaml" || true
  done
  echo "$RID2" > "$Q/fast512_rid"
fi

# ---- 3. LSTM sampling bench ----
step "bench lstm"
BENCH_MODEL=lstm python bench.py > "$Q/bench_lstm.log" 2>&1
step "bench lstm rc=$?"
tail -1 "$Q/bench_lstm.log"

# ---- 4. batch-scaling sweep (default shape; 512 is the headline) ----
for B in 256 1024 2048; do
  step "bench default b=$B"
  BENCH_BATCH=$B BENCH_RECOMMENDED=0 python bench.py \
    > "$Q/bench_scaling_b${B}.log" 2>&1
  step "bench b=$B rc=$?"
  tail -1 "$Q/bench_scaling_b${B}.log"
done

# ---- 5. cross-sample the e200 retrain once model.pt lands ----
REF=runs_reference/ref-freq42-e200
DEADLINE=$(( $(date +%s) + 21600 ))   # wait at most 6h
step "waiting for $REF/model.pt"
while [ ! -f "$REF/model.pt" ] && [ "$(date +%s)" -lt "$DEADLINE" ]; do
  sleep 300
done
if [ -f "$REF/model.pt" ]; then
  step "cross-sample ref e200 retrain 10k x 1000"
  python -u scripts/cross_sample_reference_weights.py --run "$REF" \
    --fourier --num-samples 10000 --num-diffusion-steps 1000 \
    --sample-batch-size 512 > "$Q/cross_ref_e200_10k.log" 2>&1
  step "cross-sample rc=$?"
  ls "$REF"/results_cross_our_sampler*.yaml >/dev/null 2>&1 && \
    qcommit "round 4: ref e200 retrain cross-sampled at 10k x 1000" \
      "$REF"/results_cross_our_sampler*.yaml || true
else
  step "SKIPPED (ref model.pt not ready within deadline)"
fi

# ---- 6. final default bench (default + fast512, warms .jax_cache) ----
step "final bench (default + recommended)"
python bench.py > "$Q/bench_final.log" 2>&1
step "final bench rc=$?"
tail -1 "$Q/bench_final.log"

step QUEUE4 DONE
