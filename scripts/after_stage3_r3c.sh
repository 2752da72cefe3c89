#!/bin/bash
# Round-4 evidence sequence, part 4: runs after part 3b
# (scripts/after_stage2_r3c2.sh) writes its "all done" line.
#
#   1. paraphrase seed replication on evidence_r3c (seeds 7, 42): the
#      seed-1234 paraphrase eval landed at 3/16 (p=0.074); VERDICT #4
#      asks for above-chance at p<0.05 with no retrieval crutch, which
#      pooling across seeds can clear if the effect is real.
#   2. r3d name-preserving caption-augmentation fine-tune (150 epochs
#      from the r3c final state, caption_augment=4, name_drop=0) —
#      the offline substitute for pretrained-BERT wording robustness
#      that does NOT drop the name token r4 measured as load-bearing.
#   3. r3d evals: dataset captions (stamped) + paraphrases.
#
# Log: /tmp/after_stage3_r3c.log
set -u
cd /root/repo
W=/tmp/after_stage3_r3c.log
EVAL="python -u scripts/eval_conditioning.py"

step() {  # step <name> <timeout> <cmd...>
  local name=$1 t=$2; shift 2
  timeout "$t" "$@" >> "$W" 2>&1
  local rc=$?
  echo "$(date -u +%T) $name rc=$rc" >> "$W"
}

echo "$(date -u +%T) waiting for part 3b to finish" > "$W"
while ! grep -q "all done" /tmp/after_stage2_r3c2.log 2>/dev/null; do sleep 60; done
echo "$(date -u +%T) part 3b done, TPU free" >> "$W"

# 1. paraphrase replication (recipe-matched to the seed-1234 eval)
step paraphrase_seed7 2400 $EVAL evidence_r3c 16 25 dpmpp 2.0 \
  docs/eval_conditioning_paraphrase_r3c_seed7.json 1 mean \
  prompts=paraphrase seed=7
step paraphrase_seed42 2400 $EVAL evidence_r3c 16 25 dpmpp 2.0 \
  docs/eval_conditioning_paraphrase_r3c_seed42.json 1 mean \
  prompts=paraphrase seed=42

# 2. r3d fine-tune: 150 epochs of name-preserving caption augmentation
RESUME=$(ls -t experiments/evidence_r3c_diffusion/checkpoints/diffusion_step_*.ckpt | head -1)
step r3d_finetune 7200 python -u -m psg_tpu.train.cli --stage 2 \
  --config config/r3_evidence.yaml --experiment-name evidence_r3d \
  --vae-checkpoint experiments/evidence_r3c_vae/checkpoints/vae_best_model.ckpt \
  --resume "$RESUME" \
  --override data.batch_size=8 \
  --override training.diffusion_epochs=825 \
  --override training.save_every=9999 \
  --override training.sample_every=150 \
  --override training.best_every=25 \
  --override training.val_every=5 \
  --override extra.cond_dropout=0.1 \
  --override extra.snr_gamma=5.0 \
  --override extra.caption_augment=4 \
  --override extra.caption_name_drop=0.0 \
  --override extra.sample_guidance=2.0

# 3. r3d evals: dataset (stamped) first, then paraphrases x2 seeds
step r3d_eval_dataset 3600 $EVAL evidence_r3d 16 10 dpmpp 2.0 \
  docs/eval_conditioning_r3d.json 1 mean stamp=1
step r3d_eval_paraphrase 2400 $EVAL evidence_r3d 16 25 dpmpp 2.0 \
  docs/eval_conditioning_paraphrase_r3d.json 1 mean prompts=paraphrase
step r3d_eval_paraphrase_seed7 2400 $EVAL evidence_r3d 16 25 dpmpp 2.0 \
  docs/eval_conditioning_paraphrase_r3d_seed7.json 1 mean \
  prompts=paraphrase seed=7

echo "$(date -u +%T) all done" >> "$W"
