#!/bin/bash
# Round-3 continuation #3, queue 4 (chained on QUEUE3 DONE). Upgrades the
# recommended shapes to the full 10k x 1000 protocol:
#   1. Retrain fast512 f600 EMA (the ad7e15cb recipe -- its checkpoints
#      were destroyed by the machine wipe) and sample 1k (sanity vs the
#      recorded ad7e15cb row) then 10k with checkpoint=best and =last --
#      full-protocol quality for the Pareto table's recommended row.
#   2. The queue2 flagship refresh run: 10k with checkpoint=last -- the
#      "best-checkpoint probe rerun" confirmation RESULTS.md queued (the
#      pre-wipe probe artifact was lost).
# Logs: /tmp/r4q/queue.log (+ per-step logs alongside).
set -u
cd /root/repo
Q=/tmp/r4q
mkdir -p "$Q"
exec >> "$Q/queue.log" 2>&1

step() { echo "=== $(date '+%F %T') $*"; }

until grep -q "QUEUE3 DONE" "$Q/queue.log"; do sleep 60; done
step QUEUE4 START

step train fast512 f600 re-create
fdiff-train datamodule=synthetic fourier_transform=true trainer.max_epochs=600 \
  trainer.ema_decay=0.999 score_model=fast score_model.dim_feedforward=512 \
  trainer.callbacks.sampling.enabled=false > "$Q/fast512_train.log" 2>&1
RID=$(grep -oE 'run_id=[a-z0-9]+' "$Q/fast512_train.log" | tail -1 | cut -d= -f2)
step "fast512 recreate run_id=$RID"
if [ -n "$RID" ] && [ -d "runs/$RID" ]; then
  step "fast512 1k sanity"
  fdiff-sample "model_id=$RID" num_samples=1000 \
    sampler.sample_batch_size=512 > "$Q/fast512_1k.log" 2>&1
  step "fast512 1k rc=$?"
  for ckpt in best last; do
    step "fast512 10k ckpt=$ckpt"
    cp -r "runs/$RID" "runs/${RID}_10k_$ckpt"
    fdiff-sample "model_id=${RID}_10k_$ckpt" num_samples=10000 \
      "checkpoint=$ckpt" sampler.sample_batch_size=512 \
      > "$Q/fast512_10k_$ckpt.log" 2>&1
    step "fast512 10k ckpt=$ckpt rc=$?"
  done
fi

RID2=$(grep -oE 'flagship refresh run_id=[a-z0-9]+' "$Q/queue.log" | tail -1 | grep -oE '[a-z0-9]+$')
if [ -n "$RID2" ] && [ -d "runs/$RID2" ]; then
  step "flagship refresh 10k ckpt=last base=$RID2"
  cp -r "runs/$RID2" "runs/${RID2}_10k_last"
  fdiff-sample "model_id=${RID2}_10k_last" num_samples=10000 \
    checkpoint=last sampler.sample_batch_size=512 \
    > "$Q/flagship_10k_last.log" 2>&1
  step "flagship refresh 10k rc=$?"
else
  step "flagship refresh run id not found; skipping 10k arm"
fi

step QUEUE4 DONE
