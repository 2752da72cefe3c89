#!/bin/bash
# Resume leg of the round-4 rebuild: the first stage-2 launch hung in the
# tunnel RPC layer at epoch 199 (8.7s/epoch cadence, then 18 min of
# silence; `jax.devices()` from a fresh process answered fine, so the
# tunnel was alive and the hang was process-local — the failure mode the
# round-3 watchdogs were built for).  This leg:
#
#   1. resumes stage 2 from the newest best checkpoint with an inline
#      staleness watchdog (log silent > 6 min => kill by tracked PID,
#      resume again; <= 4 attempts), budget trimmed 560 -> 450 epochs
#      (~40.5k steps) to pay for the lost 20 minutes,
#   2. runs the same two eval steps as scripts/chain_r4d.sh,
#   3. appends the "all done" marker to /tmp/chain_r4d.log so the
#      already-armed scripts/after_chain_r4d.sh watcher lands the
#      evidence exactly as planned.
set -u
cd /root/repo
W=/tmp/chain_r4d.log
LOG=experiments/evidence_r4d_diffusion/logs/diffusion.log
CKPT=experiments/evidence_r4d_diffusion/checkpoints/diffusion_best_model.ckpt
VAE=experiments/evidence_r4d_vae/checkpoints/vae_best_model.ckpt
EVAL="python -u scripts/eval_conditioning.py"
EPOCHS=450

step() {  # step <name> <timeout> <cmd...>
  local name=$1 t=$2; shift 2
  timeout "$t" "$@" >> "$W" 2>&1
  local rc=$?
  echo "$(date -u +%T) $name rc=$rc" >> "$W"
}

echo "$(date -u +%T) resume leg starting" >> "$W"
attempt=0 rc=1
while [ $attempt -lt 4 ]; do
  attempt=$((attempt+1))
  echo "$(date -u +%T) stage-2 resume attempt $attempt from $CKPT" >> "$W"
  python -u -m psg_tpu.train.cli --stage 2 \
    --config config/r3_evidence.yaml --experiment-name evidence_r4d \
    --vae-checkpoint "$VAE" --resume "$CKPT" \
    --override data.batch_size=8 \
    --override training.diffusion_epochs=$EPOCHS \
    --override training.save_every=9999 \
    --override training.sample_every=135 \
    --override training.best_every=25 \
    --override training.val_every=5 \
    --override extra.cond_dropout=0.1 \
    --override extra.snr_gamma=5.0 \
    --override extra.caption_augment=4 \
    --override extra.caption_name_drop=0.0 \
    --override extra.sample_guidance=2.0 >> "$W" 2>&1 &
  PID=$!
  START=$(date +%s)
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    # staleness is measured against the NEWER of (last log write, this
    # attempt's launch): the log's mtime predates the attempt, so a raw
    # mtime age would kill every attempt during its restore+compile
    # window (measured: the first version of this script did exactly
    # that, twice).  600s covers a cold compile; warm epochs are 8.7s.
    M=$(stat -c %Y "$LOG" 2>/dev/null || echo 0)
    REF=$(( M > START ? M : START ))
    age=$(( $(date +%s) - REF ))
    if [ "$age" -gt 600 ]; then
      echo "$(date -u +%T) log stale ${age}s - killing pid $PID" >> "$W"
      kill "$PID" 2>/dev/null; sleep 5
      kill -0 "$PID" 2>/dev/null && kill -9 "$PID" 2>/dev/null
      break
    fi
  done
  wait "$PID"; rc=$?
  echo "$(date -u +%T) stage-2 attempt $attempt exited rc=$rc" >> "$W"
  [ $rc -eq 0 ] && break
done
echo "$(date -u +%T) stage2_r4d_resume rc=$rc" >> "$W"

step eval_dataset 2700 $EVAL evidence_r4d 16 10 dpmpp 2.0 \
  docs/eval_conditioning_r4d.json 1 mean stamp=1
step eval_paraphrase 2700 $EVAL evidence_r4d 16 25 dpmpp 2.0 \
  docs/eval_conditioning_paraphrase_r4d.json 1 mean \
  prompts=paraphrase seeds=1234,7

echo "$(date -u +%T) all done" >> "$W"
