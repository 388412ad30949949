#!/bin/bash
# Round-3 continuation queue (post second machine wipe). Serial TPU jobs.
# Regenerates everything the wipe destroyed that still had open questions:
#   1. a2e40005 replica (e200 seed-43 fused no-EMA) -> int8 quality arms
#      at the full 10k x 1000 protocol (FDIFF_FUSED_INT8=0/1/2, same ckpt,
#      same sampling seed) — the r3c item lost with the checkpoints.
#   2. heads6_512 600-epoch quality run -> final Pareto-table row.
#   3. int8 benches: default shape + heads6_512, levels 1 and 2.
# Logs: /tmp/r4q/queue.log (+ per-step logs alongside).
set -u
cd /root/repo
Q=/tmp/r4q
mkdir -p "$Q"
exec >> "$Q/queue.log" 2>&1

step() { echo "=== $(date '+%F %T') $*"; }

# ---- 1. int8 quality base: replicate a2e40005 (seed 43, e200, no-EMA) ----
step train int8 base
fdiff-train datamodule=synthetic fourier_transform=true random_seed=43 \
  trainer.max_epochs=200 trainer.ema_decay=0 \
  trainer.callbacks.sampling.enabled=false > "$Q/int8_train.log" 2>&1
RID=$(grep -oE 'run_id=[a-z0-9]+' "$Q/int8_train.log" | tail -1 | cut -d= -f2)
step "int8 base run_id=$RID"

for lvl in 0 1 2; do
  step "int8 sample lvl=$lvl"
  cp -r "runs/$RID" "runs/${RID}i$lvl"
  FDIFF_FUSED_INT8=$lvl fdiff-sample "model_id=${RID}i$lvl" num_samples=10000 \
    sampler.sample_batch_size=512 > "$Q/int8_sample_$lvl.log" 2>&1
  step "int8 lvl=$lvl rc=$?"
done

# ---- 2. heads6_512 600-epoch quality run (Pareto final row) ----
step train heads6_512 f600
fdiff-train datamodule=synthetic fourier_transform=true trainer.max_epochs=600 \
  trainer.ema_decay=0.999 score_model=heads6 score_model.dim_feedforward=512 \
  trainer.callbacks.sampling.enabled=false > "$Q/h6512_train.log" 2>&1
RID2=$(grep -oE 'run_id=[a-z0-9]+' "$Q/h6512_train.log" | tail -1 | cut -d= -f2)
step "heads6_512 run_id=$RID2"
fdiff-sample "model_id=$RID2" num_samples=1000 \
  sampler.sample_batch_size=512 > "$Q/h6512_sample.log" 2>&1
step "heads6_512 sample rc=$?"

# ---- 3. int8 benches ----
for cfg in "1 default" "2 default" "1 heads6_512" "2 heads6_512"; do
  set -- $cfg
  step "bench int8=$1 model=$2"
  FDIFF_FUSED_INT8=$1 BENCH_MODEL=$2 python bench.py > "$Q/bench_i$1_$2.log" 2>&1
  tail -1 "$Q/bench_i$1_$2.log"
done

step QUEUE DONE
