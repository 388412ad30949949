#!/bin/bash
# Round-4 TPU queue D: validate the divergence guard on a genuinely
# divergent run at the published budget (VERDICT r03 weak #4 mitigation
# evidence). The seed-study checkpoints were wiped; TPU training is
# deterministic (the fast512 1k sanity bit-reproduced ad7e15cb), so the
# fused seed-42 e200 no-EMA run (45b7068d: tsw 0.6231 @10k x 1000, ~90
# divergent chains) is recreated, then sampled guard-off (determinism
# control vs the committed results) and guard-on (divergence_threshold=8).
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

step QUEUE4D START

step "retrain fused s42 e200 no-EMA (45b7068d recreate)"
fdiff-train datamodule=synthetic fourier_transform=true \
  trainer.max_epochs=200 trainer.ema_decay=0 random_seed=42 \
  trainer.save_last_every_n=10 \
  trainer.callbacks.sampling.enabled=false > "$Q/e200_s42_train.log" 2>&1
step "retrain rc=$?"
RID=$(grep -oE 'run_id=[a-z0-9]+' "$Q/e200_s42_train.log" | tail -1 | cut -d= -f2)
if [ -z "${RID}" ] || [ -z "$(ls -A "runs/$RID/checkpoints" 2>/dev/null)" ]; then
  step "SKIPPED (e200 s42 retrain failed or empty checkpoints)"
else
  step "e200 s42 run_id=$RID"
  qcommit "round 4: e200 fused s42 no-EMA checkpoint recreate ($RID)" \
    "runs/$RID/checkpoints" "runs/$RID/train_config.yaml" \
    "runs/$RID/metrics.jsonl" || true

  step "guard-off 10k x 1000 (determinism control vs 45b7068d)"
  mk_arm "$RID" "${RID}_10k_off"
  fdiff-sample "model_id=${RID}_10k_off" num_samples=10000 \
    sampler.sample_batch_size=512 > "$Q/e200_s42_10k_off.log" 2>&1
  step "guard-off rc=$?"
  [ -f "runs/${RID}_10k_off/results.yaml" ] && \
    qcommit "round 4: e200 s42 recreate 10k guard-off results ($RID)" \
      "runs/${RID}_10k_off/results.yaml" || true

  step "guard-on 10k x 1000 (divergence_threshold=8)"
  mk_arm "$RID" "${RID}_10k_guard"
  fdiff-sample "model_id=${RID}_10k_guard" num_samples=10000 \
    sampler.sample_batch_size=512 sampler.divergence_threshold=8.0 \
    sampler.max_resample_retries=3 > "$Q/e200_s42_10k_guard.log" 2>&1
  step "guard-on rc=$?"
  [ -f "runs/${RID}_10k_guard/results.yaml" ] && \
    qcommit "round 4: e200 s42 recreate 10k guard-on results ($RID)" \
      "runs/${RID}_10k_guard/results.yaml" || true
fi

step QUEUE4D DONE
