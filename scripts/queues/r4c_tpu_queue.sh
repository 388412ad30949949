#!/bin/bash
# Round-4 TPU queue C: sampler×shape composition arms, launched after
# queue B finishes (a watcher greps for QUEUE4B DONE).
#   1. fast512 (5ffd5fd3) + pc K=250 at the 10k protocol, checkpoint=last
#      — quality evidence for the composite operating point that the
#      bench now reports (fast512_pc250_samples_per_sec).
#   2. flagship (4ffeaa7e) + pc K=250 on checkpoint=last — the ladder's
#      pc row used `best`; `last` is the recommended full-protocol
#      selection, so record the pair.
# Logs: /tmp/r4q/queue.log (+ per-step logs alongside).
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

mk_arm() {
  local src=$1 dst=$2
  rm -rf "runs/$dst"
  mkdir -p "runs/$dst"
  cp "runs/$src/train_config.yaml" "runs/$dst/"
  ln -s "$(pwd)/runs/$src/checkpoints" "runs/$dst/checkpoints"
}

step QUEUE4C START

sample_arm() {  # <src_rid> <arm_suffix> <desc> <sample overrides...>
  local src=$1 suffix=$2 desc=$3; shift 3
  local arm="${src}_${suffix}"
  step "arm $arm ($desc)"
  if [ ! -d "runs/$src/checkpoints" ]; then
    step "SKIPPED ($arm: no checkpoints for $src)"
    return 1
  fi
  mk_arm "$src" "$arm"
  fdiff-sample "model_id=$arm" num_samples=10000 \
    sampler.sample_batch_size=512 "$@" > "$Q/arm_${arm}.log" 2>&1
  step "arm $arm rc=$?"
  [ -f "runs/$arm/results.yaml" ] && \
    qcommit "round 4: $desc 10k results ($arm)" "runs/$arm/results.yaml" || true
}

sample_arm 5ffd5fd3 pc250_last "fast512 x pc K=250 last" \
  num_diffusion_steps=250 sampler.method=pc checkpoint=last
sample_arm 4ffeaa7e pc250_last "flagship x pc K=250 last" \
  num_diffusion_steps=250 sampler.method=pc checkpoint=last

step QUEUE4C DONE
