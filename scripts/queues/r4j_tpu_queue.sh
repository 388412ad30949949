#!/bin/bash
# Round-4 TPU queue J: our-side e200 divergence-rate sweep, seeds 45-48.
# VERDICT r03 weak #4 asks for the knife-edge RATE, not anecdotes: with
# fused {s42 div, s43 clean, s44 mild} the rate estimate is 1-2/3. Four
# more fused seeds at the published budget (200 epochs, no EMA, freq
# domain) + 10k x 1000 guard-off census each give N=7 for the fused
# trainer, enough to bracket the rate against the reference's own
# (watcher G is producing ref seeds 42/43/44 in parallel).
# Checkpoints are NOT committed (training is bit-deterministic; three
# independent recreates so far, RESULTS.md "Divergence guard validated")
# — only train_config/metrics/results land, keeping the sweep ~KBs.
# Single-instance: /tmp/r4j.pid. Logs: /tmp/r4q/queue.log.
set -u
cd /root/repo
Q=/tmp/r4q
mkdir -p "$Q"

if [ -f /tmp/r4j.pid ] && kill -0 "$(cat /tmp/r4j.pid)" 2>/dev/null; then
  echo "queue J already running; refusing duplicate" >&2
  exit 1
fi
echo $$ > /tmp/r4j.pid

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

step QUEUE4J START

for SEED in 45 46 47 48; do
  step "e200 fused seed $SEED train (no-EMA)"
  fdiff-train datamodule=synthetic fourier_transform=true \
    trainer.max_epochs=200 trainer.ema_decay=0 "random_seed=$SEED" \
    trainer.save_last_every_n=10 \
    trainer.callbacks.sampling.enabled=false > "$Q/e200_s${SEED}_train.log" 2>&1
  step "seed $SEED train rc=$?"
  RID=$(grep -oE 'run_id=[a-z0-9]+' "$Q/e200_s${SEED}_train.log" | tail -1 | cut -d= -f2)
  if [ -z "${RID}" ] || [ -z "$(ls -A "runs/$RID/checkpoints" 2>/dev/null)" ]; then
    step "SKIPPED seed $SEED (train failed or empty checkpoints)"
    continue
  fi
  step "seed $SEED run_id=$RID"

  step "seed $SEED 10k x 1000 guard-off census"
  mk_arm "$RID" "${RID}_10k_off"
  fdiff-sample "model_id=${RID}_10k_off" num_samples=10000 \
    sampler.sample_batch_size=512 > "$Q/e200_s${SEED}_10k_off.log" 2>&1
  step "seed $SEED census rc=$?"
  if [ -f "runs/${RID}_10k_off/results.yaml" ]; then
    python scripts/divergence_decomposition.py "${RID}_10k_off" \
      > "$Q/decomp_s${SEED}.log" 2>&1
    grep -h "divergent\|bulk\|all " "$Q/decomp_s${SEED}.log" || true
    qcommit "round 4: e200 fused seed $SEED divergence-rate census ($RID)" \
      "runs/$RID/train_config.yaml" "runs/$RID/metrics.jsonl" \
      "runs/${RID}_10k_off/results.yaml" || true
  fi
done

step QUEUE4J DONE
rm -f /tmp/r4j.pid
