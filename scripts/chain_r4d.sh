#!/bin/bash
# Round-4 session-2 rebuild chain: the machine was replaced and every
# gitignored checkpoint was lost, so the r3d-recipe endpoint is trained
# from scratch as `evidence_r4d` (stage 1 already launched by hand):
#
#   1. wait for the stage-1 VAE (60 epochs) to finish,
#   2. stage-2 full budget (675 epochs ~ 61k steps, matching r3b/r3c)
#      with the r3d recipe: cond_dropout=0.1 + snr_gamma=5.0 +
#      name-preserving caption augmentation (caption_augment=4,
#      caption_name_drop=0.0) — the planned fine-tune (scripts/
#      stage2_finetune_nameaug.sh) folded into one from-scratch run,
#   3. stamped dataset-caption eval + paraphrase evals (2 seeds).
#
# Stage 3 + its eval + bench are driven interactively after this.
# Log: /tmp/chain_r4d.log
set -u
cd /root/repo
W=/tmp/chain_r4d.log
VAE=experiments/evidence_r4d_vae/checkpoints/vae_best_model.ckpt
EVAL="python -u scripts/eval_conditioning.py"

step() {  # step <name> <timeout> <cmd...>
  local name=$1 t=$2; shift 2
  timeout "$t" "$@" >> "$W" 2>&1
  local rc=$?
  echo "$(date -u +%T) $name rc=$rc" >> "$W"
}

echo "$(date -u +%T) waiting for stage-1 pid $(cat /tmp/stage1_r4d.pid)" > "$W"
while kill -0 "$(cat /tmp/stage1_r4d.pid)" 2>/dev/null; do sleep 30; done
if [ ! -f "$VAE" ]; then
  echo "$(date -u +%T) FATAL: stage-1 finished without $VAE" >> "$W"
  exit 1
fi
echo "$(date -u +%T) stage 1 done, launching stage 2" >> "$W"

step stage2_r4d 14000 python -u -m psg_tpu.train.cli --stage 2 \
  --config config/r3_evidence.yaml --experiment-name evidence_r4d \
  --vae-checkpoint "$VAE" \
  --override data.batch_size=8 \
  --override training.diffusion_epochs=675 \
  --override training.save_every=9999 \
  --override training.sample_every=135 \
  --override training.best_every=25 \
  --override training.val_every=5 \
  --override extra.cond_dropout=0.1 \
  --override extra.snr_gamma=5.0 \
  --override extra.caption_augment=4 \
  --override extra.caption_name_drop=0.0 \
  --override extra.sample_guidance=2.0

# Evals: dataset captions (stamped, drives serving/bench resolution),
# then name-free paraphrases at two seeds for the p<0.05 pooling story.
step eval_dataset 3600 $EVAL evidence_r4d 16 10 dpmpp 2.0 \
  docs/eval_conditioning_r4d.json 1 mean stamp=1
step eval_paraphrase 2400 $EVAL evidence_r4d 16 25 dpmpp 2.0 \
  docs/eval_conditioning_paraphrase_r4d.json 1 mean prompts=paraphrase
step eval_paraphrase_seed7 2400 $EVAL evidence_r4d 16 25 dpmpp 2.0 \
  docs/eval_conditioning_paraphrase_r4d_seed7.json 1 mean \
  prompts=paraphrase seed=7

echo "$(date -u +%T) all done" >> "$W"
