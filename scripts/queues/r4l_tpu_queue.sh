#!/bin/bash
# Round-4 TPU queue L: third divergence-guard validation, on the WORST
# draws of the N=7 seed study — seed 48 (fused 05cb4a23: 59 divergent,
# tsw 0.9388; unfused b6bb5498: 92 divergent, tsw 0.9029, the worst run
# of all fourteen). Guard-on 10k x 1000 census for both arms, using the
# checkpoints still on disk from queues J/K. Everything nice -n 19: the
# single host core belongs to watcher G's torch seed-43 retrain.
# Single-instance: /tmp/r4l.pid. Logs: /tmp/r4q/queue.log.
set -u
cd /root/repo
Q=/tmp/r4q
mkdir -p "$Q"

if [ -f /tmp/r4l.pid ] && kill -0 "$(cat /tmp/r4l.pid)" 2>/dev/null; then
  echo "queue L already running; refusing duplicate" >&2
  exit 1
fi
echo $$ > /tmp/r4l.pid

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

mk_arm() {
  local src=$1 dst=$2
  rm -rf "runs/$dst"
  mkdir -p "runs/$dst"
  cp "runs/$src/train_config.yaml" "runs/$dst/"
  ln -s "$(pwd)/runs/$src/checkpoints" "runs/$dst/checkpoints"
}

step QUEUE4L START

for ARM in "fused 05cb4a23" "unfused b6bb5498"; do
  set -- $ARM
  NAME=$1 RID=$2
  if [ -z "$(ls -A "runs/$RID/checkpoints" 2>/dev/null)" ]; then
    step "SKIPPED s48 $NAME (no checkpoints on disk for $RID)"
    continue
  fi
  step "s48 $NAME guard-on 10k x 1000 (divergence_threshold=8)"
  mk_arm "$RID" "${RID}_10k_guard"
  nice -n 19 fdiff-sample "model_id=${RID}_10k_guard" num_samples=10000 \
    sampler.sample_batch_size=512 sampler.divergence_threshold=8.0 \
    sampler.max_resample_retries=3 > "$Q/e200_s48_${NAME}_10k_guard.log" 2>&1
  step "s48 $NAME guard-on rc=$?"
  if [ -f "runs/${RID}_10k_guard/results.yaml" ]; then
    nice -n 19 python scripts/divergence_decomposition.py "${RID}_10k_guard" \
      > "$Q/decomp_s48_${NAME}_guard.log" 2>&1
    grep -h "divergent\|redraw\|bulk (n\|all (n" \
      "$Q/e200_s48_${NAME}_10k_guard.log" "$Q/decomp_s48_${NAME}_guard.log" || true
    qcommit "round 4: s48 $NAME worst-draw guard-on census ($RID)" \
      "runs/${RID}_10k_guard/results.yaml" || true
  fi
done

step QUEUE4L DONE
rm -f /tmp/r4l.pid
