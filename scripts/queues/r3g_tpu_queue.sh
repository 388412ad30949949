#!/bin/bash
# Round-3 continuation #5 queue (fresh machine after another /tmp+checkpoint
# wipe; nothing chained — this is the only queue this session). Priority
# order, highest-value first so an early round end still lands the big items:
#   1. Plain `python bench.py` — warms the persistent compile cache for the
#      driver's end-of-round bench and re-records the headline on this boot.
#   2. Flagship f600 refresh (98982644 recipe) + 10k x 1000 samples with
#      checkpoint=best and =last — recreates the wiped default-recipe
#      checkpoint and the best-ckpt tail probe at the full protocol.
#   3. fast512 f600 recreate (ad7e15cb recipe) + 1k sanity + 10k best/last —
#      full-protocol quality for the recommended fast shape.
#   4. heads6_512 R=8/b1024 bench arms (queue5 content) — probes whether the
#      shape clears 2x the default headline; R is a pure scheduling knob.
#   5. b1024 batch-scaling arms (queue3 content).
#   6. Final plain bench so the cache is warm whenever the driver fires.
# Logs: /tmp/r4q/queue.log (+ per-step logs alongside).
set -u
cd /root/repo
Q=/tmp/r4q
mkdir -p "$Q"
exec >> "$Q/queue.log" 2>&1

step() { echo "=== $(date '+%F %T') $*"; }
step QUEUEG START

# ---- 1. cache-warm headline bench ----
step "bench default (cache warm)"
python bench.py > "$Q/bench_default.log" 2>&1
tail -1 "$Q/bench_default.log"

# ---- 2. flagship f600 refresh + 10k protocol ----
step "train flagship f600 refresh"
fdiff-train datamodule=synthetic fourier_transform=true trainer.max_epochs=600 \
  trainer.ema_decay=0.999 \
  trainer.callbacks.sampling.enabled=false > "$Q/flagship_train.log" 2>&1
step "flagship train rc=$?"
RID=$(grep -oE 'run_id=[a-z0-9]+' "$Q/flagship_train.log" | tail -1 | cut -d= -f2)
step "flagship refresh run_id=$RID"
if [ -z "$RID" ] || [ ! -d "runs/$RID" ]; then
  step "SKIPPED flagship 10k arms (train failed: no run_id/dir)"
fi
if [ -n "$RID" ] && [ -d "runs/$RID" ]; then
  for ckpt in best last; do
    step "flagship 10k ckpt=$ckpt"
    rm -rf "runs/${RID}_10k_$ckpt"
    mkdir -p "runs/${RID}_10k_$ckpt"
    cp "runs/$RID/train_config.yaml" "runs/${RID}_10k_$ckpt/"
    ln -s "$(pwd)/runs/$RID/checkpoints" "runs/${RID}_10k_$ckpt/checkpoints"
    fdiff-sample "model_id=${RID}_10k_$ckpt" num_samples=10000 \
      "checkpoint=$ckpt" sampler.sample_batch_size=512 \
      > "$Q/flagship_10k_$ckpt.log" 2>&1
    step "flagship 10k ckpt=$ckpt rc=$?"
  done
fi

# ---- 3. fast512 f600 recreate + 10k protocol ----
step "train fast512 f600 re-create"
fdiff-train datamodule=synthetic fourier_transform=true trainer.max_epochs=600 \
  trainer.ema_decay=0.999 score_model=fast score_model.dim_feedforward=512 \
  trainer.callbacks.sampling.enabled=false > "$Q/fast512_train.log" 2>&1
step "fast512 train rc=$?"
RID2=$(grep -oE 'run_id=[a-z0-9]+' "$Q/fast512_train.log" | tail -1 | cut -d= -f2)
step "fast512 recreate run_id=$RID2"
if [ -z "$RID2" ] || [ ! -d "runs/$RID2" ]; then
  step "SKIPPED fast512 arms (train failed: no run_id/dir)"
fi
if [ -n "$RID2" ] && [ -d "runs/$RID2" ]; then
  step "fast512 1k sanity"
  fdiff-sample "model_id=$RID2" num_samples=1000 \
    sampler.sample_batch_size=512 > "$Q/fast512_1k.log" 2>&1
  step "fast512 1k rc=$?"
  for ckpt in best last; do
    step "fast512 10k ckpt=$ckpt"
    rm -rf "runs/${RID}_10k_$ckpt"
    mkdir -p "runs/${RID}_10k_$ckpt"
    cp "runs/$RID2/train_config.yaml" "runs/${RID}_10k_$ckpt/"
    ln -s "$(pwd)/runs/$RID2/checkpoints" "runs/${RID}_10k_$ckpt/checkpoints"
    fdiff-sample "model_id=${RID2}_10k_$ckpt" num_samples=10000 \
      "checkpoint=$ckpt" sampler.sample_batch_size=512 \
      > "$Q/fast512_10k_$ckpt.log" 2>&1
    step "fast512 10k ckpt=$ckpt rc=$?"
  done
fi

# ---- 4. heads6_512 R-sweep benches ----
for arm in "512 8" "1024 8" "1024 4"; do
  read -r B R <<< "$arm"
  step "bench heads6_512 b=$B R=$R"
  BENCH_BATCH=$B FDIFF_FUSED_R=$R BENCH_MODEL=heads6_512 \
    python bench.py > "$Q/bench_h6512_b${B}_r${R}.log" 2>&1
  tail -1 "$Q/bench_h6512_b${B}_r${R}.log"
done

# ---- 5. b1024 batch scaling ----
for cfg in "default" "fast512"; do
  step "bench b1024 model=$cfg"
  BENCH_BATCH=1024 BENCH_MODEL=$cfg python bench.py > "$Q/bench_b1024_$cfg.log" 2>&1
  tail -1 "$Q/bench_b1024_$cfg.log"
done

# ---- 6. final cache-warm default bench ----
step "final cache-warm default bench"
python bench.py > "$Q/bench_default_warm.log" 2>&1
tail -1 "$Q/bench_default_warm.log"

step QUEUEG DONE
