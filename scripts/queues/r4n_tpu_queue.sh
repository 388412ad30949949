#!/bin/bash
# Round-4 TPU queue N: regenerate the seed-49 e200 divergence censuses
# whose exact divergent-chain counts were lost to wipe #5 (the counts
# lived only in /tmp decomposition logs; runs/{eab9d75d,32d9db02}_10k_off
# results.yaml are committed but predate the in-results census fields).
# Training is bit-deterministic (three confirmed bit-identical recreates,
# RESULTS.md), so retraining seed 49 reproduces the same weights and the
# census now self-reports via divergence_census_count (cli/sample.py).
# Waits for queue M (/tmp/r4m.pid) to release the chip before starting.
# Single-instance: /tmp/r4n.pid. Logs: /tmp/r4q/queue.log.
set -u
cd /root/repo
Q=/tmp/r4q
mkdir -p "$Q"

if [ -f /tmp/r4n.pid ] && kill -0 "$(cat /tmp/r4n.pid)" 2>/dev/null; then
  echo "queue N already running; refusing duplicate" >&2
  exit 1
fi
echo $$ > /tmp/r4n.pid

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

command -v fdiff-train >/dev/null 2>&1 || \
  pip install -e . --no-deps --no-build-isolation -q

mk_arm() {
  local src=$1 dst=$2
  rm -rf "runs/$dst"
  mkdir -p "runs/$dst"
  cp "runs/$src/train_config.yaml" "runs/$dst/"
  ln -s "$(pwd)/runs/$src/checkpoints" "runs/$dst/checkpoints"
}

step QUEUE4N WAITING for queue M
while [ -f /tmp/r4m.pid ] && kill -0 "$(cat /tmp/r4m.pid)" 2>/dev/null; do
  sleep 60
done
step QUEUE4N START

SEED=49
for ARM in fused unfused; do
  FUSED=1; [ "$ARM" = unfused ] && FUSED=0
  step "e200 $ARM seed $SEED regen train (no-EMA)"
  FDIFF_FUSED_TRAIN=$FUSED nice -n 19 fdiff-train datamodule=synthetic \
    fourier_transform=true trainer.max_epochs=200 trainer.ema_decay=0 \
    "random_seed=$SEED" trainer.save_last_every_n=10 \
    trainer.callbacks.sampling.enabled=false \
    > "$Q/e200_s${SEED}_${ARM}_regen_train.log" 2>&1
  step "$ARM seed $SEED regen train rc=$?"
  RID=$(grep -oE 'run_id=[a-z0-9]+' "$Q/e200_s${SEED}_${ARM}_regen_train.log" | tail -1 | cut -d= -f2)
  if [ -z "${RID}" ] || [ -z "$(ls -A "runs/$RID/checkpoints" 2>/dev/null)" ]; then
    step "SKIPPED $ARM seed $SEED regen (train failed or empty checkpoints)"
    continue
  fi
  step "$ARM seed $SEED regen run_id=$RID"
  step "$ARM seed $SEED regen 10k x 1000 guard-off census"
  mk_arm "$RID" "${RID}_10k_off"
  nice -n 19 fdiff-sample "model_id=${RID}_10k_off" num_samples=10000 \
    sampler.sample_batch_size=512 > "$Q/e200_s${SEED}_${ARM}_regen_10k_off.log" 2>&1
  step "$ARM seed $SEED regen census rc=$?"
  if [ -f "runs/${RID}_10k_off/results.yaml" ]; then
    grep -h "divergence_census" "runs/${RID}_10k_off/results.yaml" || true
    qcommit "round 4: e200 $ARM seed 49 census regen with in-results counts ($RID)" \
      "runs/$RID/train_config.yaml" "runs/$RID/metrics.jsonl" \
      "runs/${RID}_10k_off/results.yaml" || true
  fi
done

step QUEUE4N DONE
rm -f /tmp/r4n.pid
