#!/bin/bash
# Round-4 TPU queue M: extend the e200 divergence-rate sweep to seeds
# 49-52, BOTH trainer arms (fused + unfused), 10k x 1000 guard-off
# census each. Takes the seed study from N=7 to N=11 per arm, halving
# the error on the clean-seed fraction that the ours-vs-reference rate
# comparison rests on (RESULTS.md "Divergence rate"). Everything
# nice -n 19: the single host core belongs to the torch seed-43
# retrain (watcher G). Checkpoints are NOT committed (bit-deterministic
# training; regenerate via the train command below).
# Single-instance: /tmp/r4m.pid. Logs: /tmp/r4q/queue.log.
set -u
cd /root/repo
Q=/tmp/r4q
mkdir -p "$Q"

if [ -f /tmp/r4m.pid ] && kill -0 "$(cat /tmp/r4m.pid)" 2>/dev/null; then
  echo "queue M already running; refusing duplicate" >&2
  exit 1
fi
echo $$ > /tmp/r4m.pid

exec >> "$Q/queue.log" 2>&1

# Wipes drop the editable install (fdiff-train rc=127); self-heal.
command -v fdiff-train >/dev/null 2>&1 || \
  pip install -e . --no-deps --no-build-isolation -q

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

step QUEUE4M START

# Seed 49 (both arms) completed + committed before wipe #5; resume at 50.
for SEED in 50 51 52; do
  for ARM in fused unfused; do
    FUSED=1; [ "$ARM" = unfused ] && FUSED=0
    step "e200 $ARM seed $SEED train (no-EMA)"
    FDIFF_FUSED_TRAIN=$FUSED nice -n 19 fdiff-train datamodule=synthetic \
      fourier_transform=true trainer.max_epochs=200 trainer.ema_decay=0 \
      "random_seed=$SEED" trainer.save_last_every_n=10 \
      trainer.callbacks.sampling.enabled=false \
      > "$Q/e200_s${SEED}_${ARM}_train.log" 2>&1
    step "$ARM seed $SEED train rc=$?"
    RID=$(grep -oE 'run_id=[a-z0-9]+' "$Q/e200_s${SEED}_${ARM}_train.log" | tail -1 | cut -d= -f2)
    if [ -z "${RID}" ] || [ -z "$(ls -A "runs/$RID/checkpoints" 2>/dev/null)" ]; then
      step "SKIPPED $ARM seed $SEED (train failed or empty checkpoints)"
      continue
    fi
    step "$ARM seed $SEED run_id=$RID"

    step "$ARM seed $SEED 10k x 1000 guard-off census"
    mk_arm "$RID" "${RID}_10k_off"
    nice -n 19 fdiff-sample "model_id=${RID}_10k_off" num_samples=10000 \
      sampler.sample_batch_size=512 > "$Q/e200_s${SEED}_${ARM}_10k_off.log" 2>&1
    step "$ARM seed $SEED census rc=$?"
    if [ -f "runs/${RID}_10k_off/results.yaml" ]; then
      nice -n 19 python scripts/divergence_decomposition.py "${RID}_10k_off" \
        > "$Q/decomp_s${SEED}_${ARM}.log" 2>&1
      grep -h "divergent\|bulk (n\|all (n" "$Q/decomp_s${SEED}_${ARM}.log" || true
      qcommit "round 4: e200 $ARM seed $SEED divergence-rate census ($RID)" \
        "runs/$RID/train_config.yaml" "runs/$RID/metrics.jsonl" \
        "runs/${RID}_10k_off/results.yaml" || true
    fi
  done
done

step QUEUE4M DONE
rm -f /tmp/r4m.pid
