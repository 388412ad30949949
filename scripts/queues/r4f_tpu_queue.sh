#!/bin/bash
# Round-4 TPU queue F: small closers surfaced while folding queue C/D/E.
#   1. Flagship pc K=250 with EXPLICIT checkpoint=best: the committed
#      runs/4ffeaa7e_pc250 (pre-wipe, invocation log lost) is bit-identical
#      to the round-4 checkpoint=last arm, so the ladder's pc-250 row is
#      actually the LAST checkpoint despite the table saying best. This
#      run produces the true best-checkpoint number and settles the label.
#   2. Divergence decomposition of the recreated seed-42 fused arms
#      (guard-off bulk cell in the seed-study table was lost to wipe #3;
#      guard-on decomposition quantifies the post-guard bulk).
# Logs: /tmp/r4q/queue.log.
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

step QUEUE4F START

step "flagship pc K=250 checkpoint=best (ladder label settle)"
mk_arm 4ffeaa7e 4ffeaa7e_pc250_best
fdiff-sample model_id=4ffeaa7e_pc250_best num_samples=10000 \
  num_diffusion_steps=250 sampler.method=pc checkpoint=best \
  sampler.sample_batch_size=512 > "$Q/ladder_pc250_best.log" 2>&1
step "pc250 best rc=$?"
[ -f runs/4ffeaa7e_pc250_best/results.yaml ] && \
  qcommit "round 4 ladder: pc K=250 checkpoint=best 10k results (4ffeaa7e)" \
    runs/4ffeaa7e_pc250_best/results.yaml \
    runs/4ffeaa7e_pc250_best/sample_config.yaml || true

step "divergence decomposition: 41de6e78 guard-off + guard-on"
python -u scripts/divergence_decomposition.py 41de6e78_10k_off \
  41de6e78_10k_guard > "$Q/decomp_41de6e78.log" 2>&1
step "decomposition rc=$?"
cat "$Q/decomp_41de6e78.log"

step QUEUE4F DONE
