#!/bin/bash
# Round-5 part B, self-executing (round-4 lesson: interactive sessions get
# cut off — every leg must land its own evidence).  Waits for part A
# (scripts/chain_r5.sh writes "all done" to /tmp/chain_r5.log), then:
#
#   1. the denoise-perf A/B sweep (scripts/perf_r5.sh, ~45 min) while the
#      TPU is free — VERDICT r5 #4,
#   2. stage-2 retrained with extra.prediction_type=v on top of the full
#      r4d recipe as `evidence_r5v` (same budget as part A) — VERDICT r5
#      #3's anatomy lever,
#   3. stamped dataset eval + pooled two-seed paraphrase eval; serving/
#      bench resolution then picks A vs B on measured conditioning.
#
# Log: /tmp/chain_r5b.log
set -u
cd /root/repo
W=/tmp/chain_r5b.log
LOG=experiments/evidence_r5v_diffusion/logs/diffusion.log
CKPT=experiments/evidence_r5v_diffusion/checkpoints/diffusion_best_model.ckpt
VAE=experiments/evidence_r4d_vae/checkpoints/vae_best_model.ckpt
EVAL="python -u scripts/eval_conditioning.py"
EPOCHS=675

step() {  # step <name> <timeout> <cmd...>
  local name=$1 t=$2; shift 2
  timeout "$t" "$@" >> "$W" 2>&1
  local rc=$?
  echo "$(date -u +%T) $name rc=$rc" >> "$W"
}

echo "$(date -u +%T) chain_r5b armed, waiting for part A" > "$W"
while ! grep -q "all done" /tmp/chain_r5.log 2>/dev/null; do sleep 60; done
echo "$(date -u +%T) part A done" >> "$W"

step perf_sweep 4200 bash scripts/perf_r5.sh
cp /tmp/perf_r5.jsonl docs/perf_r5.jsonl 2>/dev/null || true

attempt=0 rc=1
while [ $attempt -lt 4 ]; do
  attempt=$((attempt+1))
  RESUME=()
  [ $attempt -gt 1 ] && [ -f "$CKPT" ] && RESUME=(--resume "$CKPT")
  echo "$(date -u +%T) stage-2v attempt $attempt ${RESUME[*]:-fresh}" >> "$W"
  python -u -m psg_tpu.train.cli --stage 2 \
    --config config/r3_evidence.yaml --experiment-name evidence_r5v \
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
    --override extra.prediction_type=v \
    --override extra.sample_guidance=2.0 >> "$W" 2>&1 &
  PID=$!
  START=$(date +%s)
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    M=$(stat -c %Y "$LOG" 2>/dev/null || echo 0)
    REF=$(( M > START ? M : START ))
    age=$(( $(date +%s) - REF ))
    # 900s window: epoch-0 compile measured 474s on this host with an
    # idle CPU, and part A's attempt 2 showed 600s is too tight when
    # anything else touches the core
    if [ "$age" -gt 900 ]; then
      echo "$(date -u +%T) log stale ${age}s - killing pid $PID" >> "$W"
      kill "$PID" 2>/dev/null; sleep 5
      kill -0 "$PID" 2>/dev/null && kill -9 "$PID" 2>/dev/null
      break
    fi
  done
  wait "$PID"; rc=$?
  echo "$(date -u +%T) stage-2v attempt $attempt exited rc=$rc" >> "$W"
  [ $rc -eq 0 ] && break
done
echo "$(date -u +%T) stage2_r5v rc=$rc" >> "$W"

step eval_dataset_v 2700 $EVAL evidence_r5v 16 10 dpmpp 2.0 \
  docs/eval_conditioning_r5v.json 1 mean stamp=1
step eval_paraphrase_v 2700 $EVAL evidence_r5v 16 25 dpmpp 2.0 \
  docs/eval_conditioning_paraphrase_r5v.json 1 mean \
  prompts=paraphrase seeds=1234,7

echo "$(date -u +%T) all done" >> "$W"
