#!/bin/bash
# Round-4 TPU queue I: guard validation on a MILD knife-edge draw.
# Queue D validated the divergence guard on the catastrophic seed-42
# fused draw (tsw 0.623 -> 0.105, still 1.6x off clean). The common
# failure mode is milder — seed 44 fused (bb928a91: tsw 0.1880, 5
# census-divergent chains). If the guard pulls a mild draw to the clean
# band (~0.067), the recommendation upgrades from "mitigates" to
# "converts mild knife-edge draws to clean". Checkpoints were wiped;
# training is deterministic (queue D bit-reproduced 45b7068d twice), so
# retrain seed 44, control guard-off (must bit-match 0.1880), then
# guard-on. Waits for queue H. Single-instance: /tmp/r4i.pid.
set -u
cd /root/repo
Q=/tmp/r4q
mkdir -p "$Q"

if [ -f /tmp/r4i.pid ] && kill -0 "$(cat /tmp/r4i.pid)" 2>/dev/null; then
  echo "queue I already running; refusing duplicate" >&2
  exit 1
fi
echo $$ > /tmp/r4i.pid

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

until grep -q "QUEUE4H DONE" "$Q/queue.log"; do sleep 60; done

step QUEUE4I START

step "retrain fused s44 e200 no-EMA (bb928a91 recreate)"
fdiff-train datamodule=synthetic fourier_transform=true \
  trainer.max_epochs=200 trainer.ema_decay=0 random_seed=44 \
  trainer.save_last_every_n=10 \
  trainer.callbacks.sampling.enabled=false > "$Q/e200_s44_train.log" 2>&1
step "retrain s44 rc=$?"
RID=$(grep -oE 'run_id=[a-z0-9]+' "$Q/e200_s44_train.log" | tail -1 | cut -d= -f2)
if [ -z "${RID}" ] || [ -z "$(ls -A "runs/$RID/checkpoints" 2>/dev/null)" ]; then
  step "SKIPPED (s44 retrain failed or empty checkpoints)"
else
  step "e200 s44 run_id=$RID"
  qcommit "round 4: e200 fused s44 no-EMA checkpoint recreate ($RID)" \
    "runs/$RID/checkpoints" "runs/$RID/train_config.yaml" \
    "runs/$RID/metrics.jsonl" || true

  step "s44 guard-off 10k x 1000 (determinism control vs bb928a91)"
  mk_arm "$RID" "${RID}_10k_off"
  fdiff-sample "model_id=${RID}_10k_off" num_samples=10000 \
    sampler.sample_batch_size=512 > "$Q/e200_s44_10k_off.log" 2>&1
  step "s44 guard-off rc=$?"
  [ -f "runs/${RID}_10k_off/results.yaml" ] && \
    qcommit "round 4: e200 s44 recreate 10k guard-off results ($RID)" \
      "runs/${RID}_10k_off/results.yaml" || true

  step "s44 guard-on 10k x 1000 (divergence_threshold=8)"
  mk_arm "$RID" "${RID}_10k_guard"
  fdiff-sample "model_id=${RID}_10k_guard" num_samples=10000 \
    sampler.sample_batch_size=512 sampler.divergence_threshold=8.0 \
    sampler.max_resample_retries=3 > "$Q/e200_s44_10k_guard.log" 2>&1
  step "s44 guard-on rc=$?"
  [ -f "runs/${RID}_10k_guard/results.yaml" ] && \
    qcommit "round 4: e200 s44 recreate 10k guard-on results ($RID)" \
      "runs/${RID}_10k_guard/results.yaml" || true
fi

step QUEUE4I DONE
rm -f /tmp/r4i.pid
