#!/bin/bash
# Round-3 continuation #4, queue 5 (chained on QUEUE4 DONE). Cheap
# bench-only arms probing whether heads6_512 can clear 2x the default
# headline (currently 1.92x at R=4/b512):
#   1. R=8 at b512/b1024: the round-2 "R=8 regresses" result was at
#      d_ff=2048 where the attention head groups shrank under the 16 MB
#      VMEM budget; heads6_512 (d72/6h/512ff) has ~4x less FFN VMEM, so
#      the larger blocking may fit and win. R is a pure scheduling knob
#      (numerically identical program), so any win moves the shape's
#      headline directly.
#   2. Final plain `python bench.py` so the persistent compile cache is
#      warm for the driver's end-of-round bench.
# Logs: /tmp/r4q/queue.log (+ per-step logs alongside).
set -u
cd /root/repo
Q=/tmp/r4q
mkdir -p "$Q"
exec >> "$Q/queue.log" 2>&1

step() { echo "=== $(date '+%F %T') $*"; }

until grep -q "QUEUE4 DONE" "$Q/queue.log"; do sleep 60; done
step QUEUE5 START

for arm in "512 8" "1024 8" "1024 4"; do
  read -r B R <<< "$arm"
  step "bench heads6_512 b=$B R=$R"
  BENCH_BATCH=$B FDIFF_FUSED_R=$R BENCH_MODEL=heads6_512 \
    python bench.py > "$Q/bench_h6512_b${B}_r${R}.log" 2>&1
  tail -1 "$Q/bench_h6512_b${B}_r${R}.log"
done

step "final cache-warm default bench"
python bench.py > "$Q/bench_default_warm.log" 2>&1
tail -1 "$Q/bench_default_warm.log"

step QUEUE5 DONE
