#!/bin/bash
# Round-5 conditioning run (VERDICT r5 #2): the round-4 end-of-round rerun
# overwrote evidence_r4d's 560-epoch stage-2 with a 25-epoch stub, so the
# r3d recipe is retrained from scratch as `evidence_r5` at the FULL
# 675-epoch / ~61k-step r3b/r3c budget (r4d stopped at 83%):
#
#   1. wait for any PID in /tmp/verify.pid to release the TPU,
#   2. stage 2 from the completed, bit-replicated r4d VAE
#      (val 0.0485) with cond_dropout=0.1 + snr_gamma=5.0 +
#      name-preserving caption augmentation (caption_augment=4,
#      caption_name_drop=0.0); inline staleness watchdog (log silent
#      >600s => kill tracked PID, resume from newest light best; <=4
#      attempts — the round-4 tunnel-RPC hang recipe),
#   3. stamped dataset-caption eval (drives serving/bench resolution),
#   4. name-free paraphrase eval at two seeds in one process for the
#      pooled binomial test (scripts/eval_table.py --pool).
#
# Log: /tmp/chain_r5.log
set -u
cd /root/repo
W=/tmp/chain_r5.log
LOG=experiments/evidence_r5_diffusion/logs/diffusion.log
CKPT=experiments/evidence_r5_diffusion/checkpoints/diffusion_best_model.ckpt
VAE=experiments/evidence_r4d_vae/checkpoints/vae_best_model.ckpt
EVAL="python -u scripts/eval_conditioning.py"
EPOCHS=675

step() {  # step <name> <timeout> <cmd...>
  local name=$1 t=$2; shift 2
  timeout "$t" "$@" >> "$W" 2>&1
  local rc=$?
  echo "$(date -u +%T) $name rc=$rc" >> "$W"
}

echo "$(date -u +%T) chain_r5 starting" > "$W"
if [ -s /tmp/verify.pid ]; then
  while kill -0 "$(cat /tmp/verify.pid)" 2>/dev/null; do sleep 15; done
fi
[ -f "$VAE" ] || { echo "$(date -u +%T) FATAL: no $VAE" >> "$W"; exit 1; }

attempt=0 rc=1
while [ $attempt -lt 4 ]; do
  attempt=$((attempt+1))
  RESUME=()
  [ $attempt -gt 1 ] && [ -f "$CKPT" ] && RESUME=(--resume "$CKPT")
  echo "$(date -u +%T) stage-2 attempt $attempt ${RESUME[*]:-fresh}" >> "$W"
  python -u -m psg_tpu.train.cli --stage 2 \
    --config config/r3_evidence.yaml --experiment-name evidence_r5 \
    --vae-checkpoint "$VAE" "${RESUME[@]}" \
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
    # staleness vs the NEWER of (last log write, attempt launch): raw
    # mtime age would kill every attempt in its restore+compile window
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
echo "$(date -u +%T) stage2_r5 rc=$rc" >> "$W"

step eval_dataset 2700 $EVAL evidence_r5 16 10 dpmpp 2.0 \
  docs/eval_conditioning_r5.json 1 mean stamp=1
step eval_paraphrase 2700 $EVAL evidence_r5 16 25 dpmpp 2.0 \
  docs/eval_conditioning_paraphrase_r5.json 1 mean \
  prompts=paraphrase seeds=1234,7

echo "$(date -u +%T) all done" >> "$W"
