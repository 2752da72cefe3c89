#!/bin/bash
# Round-5 part C: attack the measured latent-capacity ceiling
# (docs/latent_usage_r4d_vae.txt: 4 of 8 channels collapsed under
# kl_weight_end=0.01).  Retrain stage 1 with a lower KL endpoint, verify
# the channel-usage diagnostic improves, then stage-2 at full budget on
# the new latent space.
#
# Parameterized at launch:
#   KLW    (default 0.003)  stage-1 kl_weight_end
#   PTYPE  (default eps)    stage-2 prediction_type — set from whichever
#                           of part A (eps) / part B (v) measured better
#   EPOCHS2 (default 675)   stage-2 budget (trim to fit the clock)
#
# Usage: KLW=0.003 PTYPE=v EPOCHS2=560 bash scripts/chain_r5c.sh
# Log: /tmp/chain_r5c.log
set -u
cd /root/repo
W=/tmp/chain_r5c.log
KLW=${KLW:-0.003}
PTYPE=${PTYPE:-eps}
EPOCHS2=${EPOCHS2:-675}
NAME=evidence_r5c
VAE=experiments/${NAME}_vae/checkpoints/vae_best_model.ckpt
LOG1=experiments/${NAME}_vae/logs/vae.log
LOG2=experiments/${NAME}_diffusion/logs/diffusion.log
CKPT2=experiments/${NAME}_diffusion/checkpoints/diffusion_best_model.ckpt
EVAL="python -u scripts/eval_conditioning.py"

step() {  # step <name> <timeout> <cmd...>
  local name=$1 t=$2; shift 2
  timeout "$t" "$@" >> "$W" 2>&1
  local rc=$?
  echo "$(date -u +%T) $name rc=$rc" >> "$W"
}

watchdog_run() {  # watchdog_run <log> <window> <cmd...>
  local log=$1 window=$2; shift 2
  local attempt=0 rc=1
  while [ $attempt -lt 3 ]; do
    attempt=$((attempt+1))
    echo "$(date -u +%T) attempt $attempt: $*" >> "$W"
    "$@" >> "$W" 2>&1 &
    local PID=$!
    local START=$(date +%s)
    while kill -0 "$PID" 2>/dev/null; do
      sleep 60
      local M=$(stat -c %Y "$log" 2>/dev/null || echo 0)
      local REF=$(( M > START ? M : START ))
      local age=$(( $(date +%s) - REF ))
      if [ "$age" -gt "$window" ]; then
        echo "$(date -u +%T) log stale ${age}s - killing $PID" >> "$W"
        kill "$PID" 2>/dev/null; sleep 5
        kill -0 "$PID" 2>/dev/null && kill -9 "$PID" 2>/dev/null
        break
      fi
    done
    wait "$PID"; rc=$?
    echo "$(date -u +%T) attempt $attempt exited rc=$rc" >> "$W"
    [ $rc -eq 0 ] && break
  done
  return $rc
}

echo "$(date -u +%T) chain_r5c: KLW=$KLW PTYPE=$PTYPE EPOCHS2=$EPOCHS2" > "$W"

watchdog_run "$LOG1" 900 python -u -m psg_tpu.train.cli --stage 1 \
  --config config/r3_evidence.yaml --experiment-name $NAME \
  --override data.batch_size=8 \
  --override training.vae_epochs=60 \
  --override training.kl_weight_end=$KLW \
  --override training.save_every=9999 \
  --override training.sample_every=100 \
  --override training.best_every=10 \
  --override training.val_every=5
[ -f "$VAE" ] || { echo "$(date -u +%T) FATAL: no $VAE" >> "$W"; exit 1; }

timeout 900 env PYTHONPATH=/root/repo \
  python scripts/diag_latent_usage.py "$VAE" 128 cpu \
  > docs/latent_usage_r5c_vae.txt 2>&1
echo "$(date -u +%T) diag_latent rc=$? ->" \
  "$(tail -1 docs/latent_usage_r5c_vae.txt)" >> "$W"

watchdog_run "$LOG2" 900 python -u -m psg_tpu.train.cli --stage 2 \
  --config config/r3_evidence.yaml --experiment-name $NAME \
  --vae-checkpoint "$VAE" \
  --override data.batch_size=8 \
  --override training.diffusion_epochs=$EPOCHS2 \
  --override training.save_every=9999 \
  --override training.sample_every=135 \
  --override training.best_every=25 \
  --override training.val_every=5 \
  --override extra.cond_dropout=0.1 \
  --override extra.snr_gamma=5.0 \
  --override extra.caption_augment=4 \
  --override extra.caption_name_drop=0.0 \
  --override extra.prediction_type=$PTYPE \
  --override extra.sample_guidance=2.0

step eval_dataset_c 2700 $EVAL $NAME 16 10 dpmpp 2.0 \
  docs/eval_conditioning_r5c.json 1 mean stamp=1
step eval_paraphrase_c 2700 $EVAL $NAME 16 25 dpmpp 2.0 \
  docs/eval_conditioning_paraphrase_r5c.json 1 mean \
  prompts=paraphrase seeds=1234,7

echo "$(date -u +%T) all done" >> "$W"
