#!/bin/bash
# Round-4 TPU queue B (post-wipe continuation). The machine wipe killed
# queue r4 after the pc K=250 ladder rung; this queue covers the rest,
# highest value first:
#   1. fast512 f600 retrain — the 8ddc2534 orbax checkpoints were lost
#      because qcommit's bash -c arg handling dropped the FIRST pathspec
#      (the checkpoints dir). Fixed here (msg=$1 + placeholder $0) and the
#      commit step verifies the checkpoints dir is nonempty first.
#      Then 1k sanity + 10k best/last protocol sampling.
#   2. missing sampler-ladder rungs on the flagship f600 (4ffeaa7e):
#      em K=50, pc K=50/100/1000 (em/ode rows + pc250 landed pre-wipe).
#   3. LSTM sampling bench (VERDICT r03 item 9).
#   4. per-chip batch-scaling sweep 256/1024/2048 (item 6).
#   5. cross-sample the ref e200 retrain at 10k x 1000 once model.pt
#      lands (bounded wait; the CPU retrain resumed at epoch 166).
#   6. final default bench (default + fast512; warms .jax_cache).
# Logs: /tmp/r4q/queue.log (+ per-step logs alongside).
set -u
cd /root/repo
Q=/tmp/r4q
mkdir -p "$Q"
exec >> "$Q/queue.log" 2>&1

step() { echo "=== $(date '+%F %T') $*"; }

# Commit under the shared git lock. NOTE the placeholder "_" arg: with
# bash -c, $0 is the FIRST trailing arg, so without it `shift` eats the
# first pathspec (this exact bug dropped the fast512 checkpoints).
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

# Sampling arm dir: train_config.yaml copy + checkpoints symlink.
mk_arm() {
  local src=$1 dst=$2
  rm -rf "runs/$dst"
  mkdir -p "runs/$dst"
  cp "runs/$src/train_config.yaml" "runs/$dst/"
  ln -s "$(pwd)/runs/$src/checkpoints" "runs/$dst/checkpoints"
}

step QUEUE4B START

# ---- 1. fast512 f600 retrain + 1k sanity + 10k best/last ----
step "train fast512 f600 (redo: checkpoints lost to wipe + qcommit bug)"
fdiff-train datamodule=synthetic fourier_transform=true \
  trainer.max_epochs=600 trainer.ema_decay=0.999 \
  trainer.save_last_every_n=10 score_model=fast512 \
  trainer.callbacks.sampling.enabled=false > "$Q/fast512_train.log" 2>&1
step "train fast512 rc=$?"
RID2=$(grep -oE 'run_id=[a-z0-9]+' "$Q/fast512_train.log" | tail -1 | cut -d= -f2)
if [ -z "${RID2}" ] || [ ! -d "runs/$RID2" ]; then
  step "SKIPPED (fast512 train failed: no run_id)"
elif [ -z "$(ls -A "runs/$RID2/checkpoints" 2>/dev/null)" ]; then
  step "SKIPPED (fast512 checkpoints dir empty — NOT committing)"
else
  step "fast512 run_id=$RID2"
  qcommit "round 4: fast512 f600 checkpoint redo ($RID2)" \
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

# ---- 2. missing ladder rungs (flagship f600 4ffeaa7e, ckpt=best) ----
RID=4ffeaa7e
for rung in em:50 pc:50 pc:100 pc:1000; do
  m=${rung%%:*}; K=${rung##*:}
  arm="${RID}_${m}${K}"
  step "ladder $m K=$K"
  mk_arm "$RID" "$arm"
  fdiff-sample "model_id=$arm" num_samples=10000 \
    "num_diffusion_steps=$K" "sampler.method=$m" \
    sampler.sample_batch_size=512 > "$Q/ladder_${m}${K}.log" 2>&1
  step "ladder $m K=$K rc=$?"
  [ -f "runs/$arm/results.yaml" ] && \
    qcommit "round 4 ladder: $m K=$K 10k results ($RID)" \
      "runs/$arm/results.yaml" || true
done

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
DEADLINE=$(( $(date +%s) + 18000 ))   # wait at most 5h
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

step QUEUE4B DONE
