#!/bin/bash
# Round-5 probe matrix round 3: SECOND independent init draw per
# heavy seed (init_seed=242 on fused s42, =248 on unfused s48) to
# discriminate 'any fresh init re-rolls clean' from '4/4 was luck'
# (P(clean seed) ~= 0.5 in the 11-seed study -> 4/4 has p ~= 6% by
# luck; 6/6 drops it to ~2%), plus the last missing permsalt cell
# (fused s48).
#
# The round-5 probes established "the init carries the knife edge" on
# ONE draw (unfused s48: permsalt stays divergent, initswap goes
# clean, no-op env control 877efbab stays divergent). This queue
# extends the probe to a second seed AND the other trainer arm so the
# claim no longer rests on N=1 per cell. TPU e200 trains on the
# synthetic workload are ~10 min each, censuses ~6 min, so the whole
# matrix is ~1.5 h of otherwise-idle TPU time.
#
# Arms (value order — later arms are dropped gracefully if the
# session ends first):
#   F42C  fused s42 no-op control     -> expected: divergent band
#         (current-env band anchor for the fused-s42 cell; the
#         committed 45b7068d/41de6e78 censused 89/10k pre-drift)
#   F42I  fused s42 init_seed=142     -> init-carries-it predicts clean
#   U44I  unfused s44 init_seed=144   -> third seed, other trainer
#         (committed 3765a07c censused 19/10k)
#   F42P  fused s42 perm_salt=1       -> predicts still divergent
#   U44C  unfused s44 no-op control   -> band anchor for the s44 cell
#
# Census arms are named probe_* so divergence_rate_stats.py --scan
# excludes them from the e200 seed-study pooling (STUDY_ARMS filter).
# Single-instance: /tmp/r5probe3.pid. Log: /tmp/r5q/probe_matrix3.log.
set -u
cd /root/repo
Q=/tmp/r5q
mkdir -p "$Q"

if [ -f /tmp/r5probe3.pid ] && kill -0 "$(cat /tmp/r5probe3.pid)" 2>/dev/null; then
  echo "probe matrix already running; refusing duplicate" >&2
  exit 1
fi
echo $$ > /tmp/r5probe3.pid

exec >> "$Q/probe_matrix3.log" 2>&1

command -v fdiff-train >/dev/null 2>&1 || \
  pip install -e . --no-deps --no-build-isolation -q

step() { echo "=== $(date '+%F %T') $*"; }
tpu() { flock /tmp/fdiff_tpu.lock nice -n 19 "$@"; }

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

rid_of() { grep -oE 'run_id=[a-z0-9]+' "$1" | tail -1 | cut -d= -f2; }

# run_arm <tag> <census_arm> <fused 0|1> <seed> [extra overrides...]
run_arm() {
  local tag=$1 arm=$2 fused=$3 seed=$4; shift 4
  step "$tag: train (fused=$fused seed=$seed $*)"
  tpu env FDIFF_FUSED_TRAIN=$fused fdiff-train datamodule=synthetic \
    fourier_transform=true trainer.max_epochs=200 trainer.ema_decay=0 \
    "random_seed=$seed" trainer.save_last_every_n=10 \
    trainer.callbacks.sampling.enabled=false "$@" \
    > "$Q/probe_${tag}_train.log" 2>&1
  step "$tag train rc=$?"
  local RID
  RID=$(rid_of "$Q/probe_${tag}_train.log")
  if [ -z "${RID}" ] || [ -z "$(ls -A "runs/$RID/checkpoints" 2>/dev/null)" ]; then
    step "$tag SKIPPED (train failed or empty checkpoints)"
    return 1
  fi
  step "$tag run_id=$RID"
  rm -rf "runs/${RID}_10k_off"
  mkdir -p "runs/${RID}_10k_off"
  cp "runs/$RID/train_config.yaml" "runs/${RID}_10k_off/"
  ln -s "$(pwd)/runs/$RID/checkpoints" "runs/${RID}_10k_off/checkpoints"
  tpu env FDIFF_CENSUS_ARM="$arm" fdiff-sample \
    "model_id=${RID}_10k_off" num_samples=10000 \
    sampler.sample_batch_size=512 > "$Q/probe_${tag}_census.log" 2>&1
  step "$tag census rc=$?"
  grep -h "divergence_census_count\|divergence_census_max" \
    "runs/${RID}_10k_off/results.yaml" 2>/dev/null || true
  [ -f "runs/${RID}_10k_off/results.yaml" ] && \
    qcommit "round 5: probe matrix $tag ($arm) 10k census ($RID)" \
      "runs/$RID/train_config.yaml" "runs/$RID/metrics.jsonl" \
      "runs/${RID}_10k_off/results.yaml" "runs/${RID}_10k_off/train_config.yaml" || true
}

step "R5 PROBE MATRIX 3 START"
run_arm F42I2 probe_s42f_initswap2 1 42 trainer.init_seed=242
run_arm U48I2 probe_s48u_initswap2 0 48 trainer.init_seed=248
run_arm F48P  probe_s48f_permsalt  1 48 trainer.perm_salt=1
step "R5 PROBE MATRIX 3 DONE"
rm -f /tmp/r5probe3.pid
