#!/bin/bash
# Follow-up TPU queue, chained after r3d_tpu_queue.sh (same logging dir).
#   1. Flagship refresh: 600-epoch EMA flagship (98982644 recipe) so a
#      default-recipe checkpoint exists on disk again after the wipe,
#      with a 1k @ 1000-step sample as a sanity row vs 98982644.
#   2. Fastest-config quality: heads6_512 checkpoint sampled with
#      FDIFF_FUSED_INT8=2 (composes the two throughput levers) at
#      1k @ 1000 steps — compare against its own fp arm from queue 1.
# Logs: /tmp/r4q/queue.log (+ per-step logs alongside).
set -u
cd /root/repo
Q=/tmp/r4q
mkdir -p "$Q"
exec >> "$Q/queue.log" 2>&1

step() { echo "=== $(date '+%F %T') $*"; }

# ---- 1. flagship refresh ----
step train flagship f600 refresh
fdiff-train datamodule=synthetic fourier_transform=true trainer.max_epochs=600 \
  trainer.ema_decay=0.999 \
  trainer.callbacks.sampling.enabled=false > "$Q/flagship_train.log" 2>&1
RID=$(grep -oE 'run_id=[a-z0-9]+' "$Q/flagship_train.log" | tail -1 | cut -d= -f2)
step "flagship refresh run_id=$RID"
fdiff-sample "model_id=$RID" num_samples=1000 \
  sampler.sample_batch_size=512 > "$Q/flagship_sample.log" 2>&1
step "flagship sample rc=$?"

# ---- 2. heads6_512 + int8 lvl2 quality ----
RID2=$(grep -oE 'heads6_512 run_id=[a-z0-9]+' "$Q/queue.log" | tail -1 | grep -oE '[a-z0-9]+$')
if [ -n "$RID2" ] && [ -d "runs/$RID2" ]; then
  step "heads6_512 int8 sample base=$RID2"
  cp -r "runs/$RID2" "runs/${RID2}i2"
  FDIFF_FUSED_INT8=2 fdiff-sample "model_id=${RID2}i2" num_samples=1000 \
    sampler.sample_batch_size=512 > "$Q/h6512_i2_sample.log" 2>&1
  step "heads6_512 int8 rc=$?"
else
  step "heads6_512 run id not found; skipping int8 compose arm"
fi

step QUEUE2 DONE
