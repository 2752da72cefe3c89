#!/bin/bash
# Round-5 part D, self-executing (round-4 lesson: every leg lands its own
# evidence).  Waits for part C (scripts/chain_r5c.sh writes "all done" to
# /tmp/chain_r5c.log), then, clock-gated against HARD_END:
#
#   1. denoise-perf A/B sweep (VERDICT r5 #4) -> docs/perf_r5.jsonl,
#   2. full bench (serving rows on the freshly stamped evidence_r5c pair)
#      -> docs/BENCH_r5_trained.json — the headline numbers land even if
#      later legs overrun,
#   3. two more paraphrase-eval seeds (42,123) so the pooled binomial
#      test reaches n=64 trials (VERDICT r5 #2's p<0.05 bar),
#   4. if >=135 min remain: stage-2 retrained with prediction_type=v on
#      the r5c VAE (epochs fitted to the clock) + one stamped dataset
#      eval — VERDICT r5 #3's anatomy lever; serving/bench resolution
#      then picks eps vs v on measured conditioning.
#
# Usage: nohup bash scripts/chain_r5d.sh & ; log: /tmp/chain_r5d.log
set -u
cd /root/repo
W=/tmp/chain_r5d.log
EVAL="python -u scripts/eval_conditioning.py"
[ -s /tmp/round_t0 ] || { echo "FATAL: no /tmp/round_t0"; exit 1; }
HARD_END=$(( $(cat /tmp/round_t0) + 28800 ))   # T0 + 8h: TPU freed here
left() { echo $(( HARD_END - $(date +%s) )); }

step() {  # step <name> <timeout> <cmd...>
  local name=$1 t=$2; shift 2
  timeout "$t" "$@" >> "$W" 2>&1
  local rc=$?
  echo "$(date -u +%T) $name rc=$rc left=$(left)s" >> "$W"
}

echo "$(date -u +%T) chain_r5d armed, waiting for part C (left $(left)s)" > "$W"
while ! grep -q "all done" /tmp/chain_r5c.log 2>/dev/null; do sleep 60; done
echo "$(date -u +%T) part C done, left $(left)s" >> "$W"

[ "$(left)" -gt 3300 ] && step perf_sweep 3300 bash scripts/perf_r5.sh
cp /tmp/perf_r5.jsonl docs/perf_r5.jsonl 2>/dev/null || true

[ "$(left)" -gt 2400 ] && {
  timeout 2400 python bench.py > /tmp/bench_r5d.out 2>/tmp/bench_r5d.err
  echo "$(date -u +%T) bench_full rc=$? left=$(left)s" >> "$W"
  # bench prints exactly one JSON line on success
  [ -s /tmp/bench_r5d.out ] && tail -1 /tmp/bench_r5d.out > docs/BENCH_r5_trained.json
}

[ "$(left)" -gt 2700 ] && step eval_paraphrase_pool 2700 \
  $EVAL evidence_r5c 16 25 dpmpp 2.0 \
  docs/eval_conditioning_paraphrase_r5c_s42.json 1 mean \
  prompts=paraphrase seeds=42,123

if [ "$(left)" -gt 8100 ]; then
  # fit the v-pred budget: left - compile(600) - eval(1800) - margin(900),
  # at ~10.5 s/epoch incl. val/best overhead; cap at the full 675
  EPOCHS=$(( ($(left) - 3300) / 11 ))
  [ "$EPOCHS" -gt 675 ] && EPOCHS=675
  VAE=experiments/evidence_r5c_vae/checkpoints/vae_best_model.ckpt
  LOG=experiments/evidence_r5v_diffusion/logs/diffusion.log
  CKPT=experiments/evidence_r5v_diffusion/checkpoints/diffusion_best_model.ckpt
  echo "$(date -u +%T) stage-2v for $EPOCHS epochs (left $(left)s)" >> "$W"
  attempt=0 rc=1
  while [ $attempt -lt 3 ] && [ "$(left)" -gt 2700 ]; do
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
      --override training.sample_every=250 \
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
      if [ "$age" -gt 900 ] || [ "$(left)" -lt 2100 ]; then
        echo "$(date -u +%T) stale ${age}s or deadline (left $(left)s) - kill $PID" >> "$W"
        kill "$PID" 2>/dev/null; sleep 5
        kill -0 "$PID" 2>/dev/null && kill -9 "$PID" 2>/dev/null
        break
      fi
    done
    wait "$PID"; rc=$?
    echo "$(date -u +%T) stage-2v attempt $attempt exited rc=$rc" >> "$W"
    [ $rc -eq 0 ] && break
  done
  # even a deadline-killed run leaves a best_model.ckpt worth stamping
  [ -f "$CKPT" ] && [ "$(left)" -gt 1900 ] && step eval_dataset_v 1900 \
    $EVAL evidence_r5v 16 10 dpmpp 2.0 \
    docs/eval_conditioning_r5v.json 1 mean stamp=1
fi

echo "$(date -u +%T) all done, left $(left)s" >> "$W"
