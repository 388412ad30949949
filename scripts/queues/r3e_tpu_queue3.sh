#!/bin/bash
# Round-3 continuation #3 queue. Waits for r3d_tpu_queue2.sh (QUEUE2 DONE
# marker), then runs cheap bench-only arms on the real chip:
#   1. Batch-scaling: BENCH_BATCH=1024 for default / fast512 / heads6_512.
#      The 512-chain-per-step numbers may be fixed-overhead bound; if
#      throughput scales, heads6_512 could clear 2x the default headline.
#   2. fast512 + int8 lvl1: tests the RESULTS.md claim that int8's
#      quantize/rescale overhead could be paid for at larger d_model
#      (K=128 attention / K=512 FFN contractions vs default's 72).
# Logs: /tmp/r4q/queue.log (+ per-step logs alongside).
set -u
cd /root/repo
Q=/tmp/r4q
mkdir -p "$Q"
exec >> "$Q/queue.log" 2>&1

step() { echo "=== $(date '+%F %T') $*"; }

until grep -q "QUEUE2 DONE" "$Q/queue.log"; do sleep 60; done
step QUEUE3 START

for cfg in "default" "fast512" "heads6_512"; do
  step "bench b1024 model=$cfg"
  BENCH_BATCH=1024 BENCH_MODEL=$cfg python bench.py > "$Q/bench_b1024_$cfg.log" 2>&1
  tail -1 "$Q/bench_b1024_$cfg.log"
done

step "bench int8=1 model=fast512"
FDIFF_FUSED_INT8=1 BENCH_MODEL=fast512 python bench.py > "$Q/bench_i1_fast512.log" 2>&1
tail -1 "$Q/bench_i1_fast512.log"

step QUEUE3 DONE
