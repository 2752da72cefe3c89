#!/bin/bash
# Resume leg of the round-5 part-C chain: the stage-2 run hung in the
# tunnel RPC layer at epoch 247 (8.7s/epoch cadence, then >7 min of
# silence at ~0% CPU — the same process-local axon hang round 4 hit at
# epoch 199).  chain_r5c.sh's watchdog would have restarted WITHOUT
# --resume, so this leg replaces it:
#
#   1. resume stage 2 from the best checkpoint (epoch 224) with an
#      inline staleness watchdog (log silent > 8 min => kill by tracked
#      PID, resume again; <= 4 attempts), full 675-epoch budget kept,
#   2. run part C's two eval steps unchanged,
#   3. append "all done" to /tmp/chain_r5c.log so the already-armed
#      scripts/chain_r5d.sh proceeds exactly as planned.
set -u
cd /root/repo
W=/tmp/chain_r5c.log
LOG=experiments/evidence_r5c_diffusion/logs/diffusion.log
CKPT=experiments/evidence_r5c_diffusion/checkpoints/diffusion_best_model.ckpt
VAE=experiments/evidence_r5c_vae/checkpoints/vae_best_model.ckpt
EVAL="python -u scripts/eval_conditioning.py"
EPOCHS=675

step() {  # step <name> <timeout> <cmd...>
  local name=$1 t=$2; shift 2
  timeout "$t" "$@" >> "$W" 2>&1
  local rc=$?
  echo "$(date -u +%T) $name rc=$rc" >> "$W"
}

echo "$(date -u +%T) resume leg starting (hang at epoch 247)" >> "$W"
attempt=0 rc=1
while [ $attempt -lt 4 ]; do
  attempt=$((attempt+1))
  echo "$(date -u +%T) stage-2 resume attempt $attempt from $CKPT" >> "$W"
  python -u -m psg_tpu.train.cli --stage 2 \
    --config config/r3_evidence.yaml --experiment-name evidence_r5c \
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
    --override extra.prediction_type=eps \
    --override extra.sample_guidance=2.0 >> "$W" 2>&1 &
  PID=$!
  echo "$PID" > /tmp/stage2_r5c.pid
  START=$(date +%s)
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    # staleness vs the NEWER of (last log write, attempt launch) — the
    # log predates the attempt, so raw mtime would kill the
    # restore+compile window (round-4 lesson).  900s covers a cold
    # compile AND the end-of-training full-state write (~10 min).
    M=$(stat -c %Y "$LOG" 2>/dev/null || echo 0)
    REF=$(( M > START ? M : START ))
    age=$(( $(date +%s) - REF ))
    if [ "$age" -gt 900 ]; then
      echo "$(date -u +%T) log stale ${age}s - killing pid $PID" >> "$W"
      kill "$PID" 2>/dev/null; sleep 5
      kill -0 "$PID" 2>/dev/null && kill -9 "$PID" 2>/dev/null
      break
    fi
  done
  wait "$PID"; rc=$?
  echo "$(date -u +%T) stage-2 resume attempt $attempt exited rc=$rc" >> "$W"
  [ $rc -eq 0 ] && break
done
echo "$(date -u +%T) stage2_r5c rc=$rc" >> "$W"

step eval_dataset_c 2700 $EVAL evidence_r5c 16 10 dpmpp 2.0 \
  docs/eval_conditioning_r5c.json 1 mean stamp=1
step eval_paraphrase_c 2700 $EVAL evidence_r5c 16 25 dpmpp 2.0 \
  docs/eval_conditioning_paraphrase_r5c.json 1 mean \
  prompts=paraphrase seeds=1234,7

echo "$(date -u +%T) all done" >> "$W"
