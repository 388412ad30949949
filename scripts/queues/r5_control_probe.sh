#!/bin/bash
# Round-5 control probes (session 2). Motivation: the fixed-estimator
# f600 retrains were supposed to leave the training stream
# bit-identical to the committed runs, but compare_train_series.py
# shows train/loss differing from epoch 0 in the 4th significant digit
# (e.g. flagship e0 0.0092462627 committed 08-18 vs 0.0092425961
# retrained 08-20) — a numeric perturbation, not an RNG-stream change.
# Three discriminating arms:
#   A. 3-epoch fused flagship twice with CURRENT code in the CURRENT
#      environment -> is the current env self-deterministic?
#   B. same 3-epoch run with the OLD round-4 code (worktree at
#      c6ac5c0, the commit that shipped the committed flagship) -> does
#      the round-5 trainer change alter fused-train numerics, or is it
#      environment drift across the VM reboots?
#   C. exact original unfused-s48 recipe (b6bb5498) retrained in the
#      current env + 10k census -> same question for the unfused path,
#      AND the missing same-environment control for the knife-edge
#      mechanism probes (permsalt 10/10k, initswap 0/10k).
# Single-instance: /tmp/r5ctl.pid. Logs: /tmp/r5q/control.log.
set -u
cd /root/repo
Q=/tmp/r5q
mkdir -p "$Q"

if [ -f /tmp/r5ctl.pid ] && kill -0 "$(cat /tmp/r5ctl.pid)" 2>/dev/null; then
  echo "control probe already running; refusing duplicate" >&2
  exit 1
fi
echo $$ > /tmp/r5ctl.pid

exec >> "$Q/control.log" 2>&1

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

e0_of() {
  python - "$1" <<'EOF'
import json, sys
rows = [json.loads(l) for l in open(f"runs/{sys.argv[1]}/metrics.jsonl")]
tr = [r["train/loss"] for r in rows if "train/loss" in r]
print(" ".join(repr(x) for x in tr[:3]))
EOF
}

step "R5 CONTROL PROBE START"

# ---- A. current-code fused 3-epoch determinism pair ----
for i in 1 2; do
  step "A$i: fused flagship 3-epoch (current code)"
  tpu fdiff-train datamodule=synthetic fourier_transform=true \
    trainer.max_epochs=3 trainer.ema_decay=0.999 \
    trainer.callbacks.sampling.enabled=false \
    > "$Q/det_new_$i.log" 2>&1
  step "A$i rc=$?"
  RID=$(rid_of "$Q/det_new_$i.log")
  step "A$i run_id=$RID e0..2: $(e0_of "$RID")"
  echo "$RID" > "$Q/det_new_$i.rid"
done

# ---- B. old-code (c6ac5c0) fused 3-epoch ----
step "B: fused flagship 3-epoch (OLD code, worktree at c6ac5c0)"
flock -w 120 /tmp/fdiff_git.lock git worktree add -f /tmp/oldtree c6ac5c0 \
  >/dev/null 2>&1 || step "worktree add failed (may already exist)"
tpu env PYTHONPATH=/tmp/oldtree \
  python -m fourierdiffusion_tpu.cli.train datamodule=synthetic \
  fourier_transform=true trainer.max_epochs=3 trainer.ema_decay=0.999 \
  trainer.callbacks.sampling.enabled=false \
  > "$Q/det_old.log" 2>&1
step "B rc=$?"
RID=$(rid_of "$Q/det_old.log")
step "B run_id=$RID e0..2: $(e0_of "$RID")"
echo "$RID" > "$Q/det_old.rid"
step "reference points: committed 4ffeaa7e e0=0.009246262721717358 (08-18 env);" \
  "retrain cbcc1bbe e0=0.009242596104741096 (08-20 pre-reboot env)"

# ---- C. unfused s48 control retrain + census ----
step "C: control s48 e200 retrain (exact b6bb5498 recipe, current env)"
tpu env FDIFF_FUSED_TRAIN=0 fdiff-train datamodule=synthetic \
  fourier_transform=true trainer.max_epochs=200 trainer.ema_decay=0 \
  random_seed=48 trainer.save_last_every_n=10 \
  trainer.callbacks.sampling.enabled=false \
  > "$Q/control_s48_train.log" 2>&1
step "C train rc=$?"
RID=$(rid_of "$Q/control_s48_train.log")
if [ -z "${RID}" ] || [ -z "$(ls -A "runs/$RID/checkpoints" 2>/dev/null)" ]; then
  step "C SKIPPED (train failed or empty checkpoints)"
else
  step "C run_id=$RID"
  python scripts/compare_train_series.py runs/b6bb5498 "runs/$RID" \
    > "$Q/control_s48_series.log" 2>&1
  step "C series-check rc=$? ($(tail -1 "$Q/control_s48_series.log"))"
  rm -rf "runs/${RID}_10k_off"
  mkdir -p "runs/${RID}_10k_off"
  cp "runs/$RID/train_config.yaml" "runs/${RID}_10k_off/"
  ln -s "$(pwd)/runs/$RID/checkpoints" "runs/${RID}_10k_off/checkpoints"
  tpu env FDIFF_CENSUS_ARM="probe_s48_control" fdiff-sample \
    "model_id=${RID}_10k_off" num_samples=10000 \
    sampler.sample_batch_size=512 > "$Q/control_s48_10k.log" 2>&1
  step "C census rc=$?"
  grep -h "divergence_census_count\|divergence_census_max" \
    "runs/${RID}_10k_off/results.yaml" 2>/dev/null || true
  [ -f "runs/${RID}_10k_off/results.yaml" ] && \
    qcommit "round 5: s48 same-recipe control retrain + 10k census ($RID)" \
      "runs/$RID/train_config.yaml" "runs/$RID/metrics.jsonl" \
      "runs/${RID}_10k_off/results.yaml" "runs/${RID}_10k_off/train_config.yaml" || true
fi

step "R5 CONTROL PROBE DONE"
rm -f /tmp/r5ctl.pid
