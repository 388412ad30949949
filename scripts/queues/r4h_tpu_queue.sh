#!/bin/bash
# Round-4 TPU queue H: complete the shape Pareto table's quality column.
# heads6_512 (d72/6h/dff512, 55.4 samples/s = 1.92x parity shape — the
# fastest measured shape) has only a 600-epoch quality number at 1k
# samples; train it with the flagship recipe and score at the published
# 10k x 1000 protocol (em best/last) plus the recommended composite
# sampler (pc K=250, checkpoint=last).
# Waits for the estimator-noise bootstrap to release the TPU first.
# Single-instance: /tmp/r4h.pid guard. Logs: /tmp/r4q/queue.log.
set -u
cd /root/repo
Q=/tmp/r4q
mkdir -p "$Q"

if [ -f /tmp/r4h.pid ] && kill -0 "$(cat /tmp/r4h.pid)" 2>/dev/null; then
  echo "queue H already running; refusing duplicate" >&2
  exit 1
fi
echo $$ > /tmp/r4h.pid

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

until grep -q "bootstrap rc" "$Q/queue.log"; do sleep 30; done

step QUEUE4H START

step "train heads6_512 f600 (flagship recipe)"
fdiff-train datamodule=synthetic fourier_transform=true \
  trainer.max_epochs=600 trainer.ema_decay=0.999 \
  trainer.save_last_every_n=10 score_model=heads6_512 \
  trainer.callbacks.sampling.enabled=false > "$Q/h6512_train.log" 2>&1
step "train heads6_512 rc=$?"
RID=$(grep -oE 'run_id=[a-z0-9]+' "$Q/h6512_train.log" | tail -1 | cut -d= -f2)
if [ -z "${RID}" ] || [ -z "$(ls -A "runs/$RID/checkpoints" 2>/dev/null)" ]; then
  step "SKIPPED (heads6_512 train failed or empty checkpoints)"
else
  step "heads6_512 run_id=$RID"
  qcommit "round 4: heads6_512 f600 checkpoint ($RID)" \
    "runs/$RID/checkpoints" "runs/$RID/train_config.yaml" \
    "runs/$RID/metrics.jsonl" || true
  for arm in "10k_best checkpoint=best" "10k_last checkpoint=last" \
             "pc250_last checkpoint=last num_diffusion_steps=250 sampler.method=pc"; do
    set -- $arm
    tag=$1; shift
    step "heads6_512 $tag"
    mk_arm "$RID" "${RID}_$tag"
    fdiff-sample "model_id=${RID}_$tag" num_samples=10000 \
      sampler.sample_batch_size=512 "$@" > "$Q/h6512_$tag.log" 2>&1
    step "heads6_512 $tag rc=$?"
    [ -f "runs/${RID}_$tag/results.yaml" ] && \
      qcommit "round 4: heads6_512 $tag 10k results ($RID)" \
        "runs/${RID}_$tag/results.yaml" \
        "runs/${RID}_$tag/sample_config.yaml" || true
  done
  echo "$RID" > "$Q/h6512_rid"
fi

step QUEUE4H DONE
rm -f /tmp/r4h.pid
