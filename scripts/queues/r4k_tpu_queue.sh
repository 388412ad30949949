#!/bin/bash
# Round-4 TPU queue K: UNFUSED e200 divergence-rate sweep, seeds 45-48
# (FDIFF_FUSED_TRAIN=0). Companion to queue J: gives the unfused trainer
# the same N=7 as the fused arm so the "fused-train gap does not
# reproduce" claim (RESULTS.md seed study) rests on matched samples.
# Waits for QUEUE4J DONE (shares the chip). Checkpoints are NOT
# committed (training is bit-deterministic) — only train_config/metrics/
# results land. Single-instance: /tmp/r4k.pid. Logs: /tmp/r4q/queue.log.
set -u
cd /root/repo
Q=/tmp/r4q
mkdir -p "$Q"

if [ -f /tmp/r4k.pid ] && kill -0 "$(cat /tmp/r4k.pid)" 2>/dev/null; then
  echo "queue K already running; refusing duplicate" >&2
  exit 1
fi
echo $$ > /tmp/r4k.pid

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

until grep -q "QUEUE4J DONE" "$Q/queue.log"; do sleep 60; done

step QUEUE4K START

for SEED in 45 46 47 48; do
  step "e200 UNFUSED seed $SEED train (no-EMA)"
  FDIFF_FUSED_TRAIN=0 nice -n 19 fdiff-train datamodule=synthetic fourier_transform=true \
    trainer.max_epochs=200 trainer.ema_decay=0 "random_seed=$SEED" \
    trainer.save_last_every_n=10 \
    trainer.callbacks.sampling.enabled=false > "$Q/e200_s${SEED}u_train.log" 2>&1
  step "unfused seed $SEED train rc=$?"
  RID=$(grep -oE 'run_id=[a-z0-9]+' "$Q/e200_s${SEED}u_train.log" | tail -1 | cut -d= -f2)
  if [ -z "${RID}" ] || [ -z "$(ls -A "runs/$RID/checkpoints" 2>/dev/null)" ]; then
    step "SKIPPED unfused seed $SEED (train failed or empty checkpoints)"
    continue
  fi
  step "unfused seed $SEED run_id=$RID"

  step "unfused seed $SEED 10k x 1000 guard-off census"
  mk_arm "$RID" "${RID}_10k_off"
  nice -n 19 fdiff-sample "model_id=${RID}_10k_off" num_samples=10000 \
    sampler.sample_batch_size=512 > "$Q/e200_s${SEED}u_10k_off.log" 2>&1
  step "unfused seed $SEED census rc=$?"
  if [ -f "runs/${RID}_10k_off/results.yaml" ]; then
    nice -n 19 python scripts/divergence_decomposition.py "${RID}_10k_off" \
      > "$Q/decomp_s${SEED}u.log" 2>&1
    grep -h "divergent\|bulk\|all " "$Q/decomp_s${SEED}u.log" || true
    qcommit "round 4: e200 unfused seed $SEED divergence-rate census ($RID)" \
      "runs/$RID/train_config.yaml" "runs/$RID/metrics.jsonl" \
      "runs/${RID}_10k_off/results.yaml" || true
  fi
done

step QUEUE4K DONE
rm -f /tmp/r4k.pid
