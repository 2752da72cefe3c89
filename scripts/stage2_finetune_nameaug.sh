#!/bin/bash
# Round-4 part 4 (optional, run AFTER scripts/after_stage2_r3c.sh):
# name-preserving caption-augmentation fine-tune for wording
# generalization (VERDICT r4 #4) without the name-binding collapse the
# round-4 name-drop run measured.
#
# Continues evidence_r3c's final state for 150 more epochs as a NEW run
# family (evidence_r3d) with extra.caption_augment=4 and
# extra.caption_name_drop=0: names stay in every variant, only sentence
# shuffle/dropout vary.  ~20 min at the measured 10.5 steps/s.
#
# Afterwards evaluate BOTH prompt sets (paraphrase should improve,
# dataset-caption must not regress) and stamp:
#   python scripts/eval_conditioning.py evidence_r3d 16 10 dpmpp 2.0 \
#     docs/eval_conditioning_r3d.json 1 mean stamp=1
#   python scripts/eval_conditioning.py evidence_r3d 16 25 dpmpp 2.0 \
#     docs/eval_conditioning_paraphrase_r3d.json 1 mean prompts=paraphrase
set -u
cd /root/repo
RESUME=$(ls -t experiments/evidence_r3c_diffusion/checkpoints/diffusion_step_*.ckpt | head -1)
timeout 7200 python -u -m psg_tpu.train.cli --stage 2 \
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
