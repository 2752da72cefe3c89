#!/bin/bash
# Round-4 TPU evidence sequence, fired when the stage-2 evidence_r4 run
# (800 epochs, cond_dropout=0.1 + snr_gamma=5 + caption_augment=8)
# completes.  One TPU -> strictly sequential, every step timeout-bounded.
#
# Order reflects VERDICT r3 priorities:
#   1. true-CFG conditioning eval from the pure prior (done-criterion:
#      retrieval@1 >= 0.5 @ n=16, no retrieval seeding)     [VERDICT #1]
#   2. paraphrase eval WITHOUT the retrieval crutch          [VERDICT #4]
#   3. visual grids + served sprite on the r4 checkpoint
#   4. stage 3 at budget (20 epochs, phase switch @10) via the CLI chain
#      (reference: train_3stage.py:98-188, final_trainer.py:590-642)
#                                                            [VERDICT #2]
#   5. post-stage-3 conditioning eval, stamped into the sidecar so
#      serve/hub only prefers the final bundle if not worse  [VERDICT #3]
cd /root/repo
W=/tmp/after_stage2_r4.log
echo "$(date -u +%T) start" > $W
DATA="data.csv_path=/root/reference/data/text_description_concat.csv"
IMGS="data.image_dir=/root/reference/data/small_images"

# 1a. true-CFG (zero/uncond branch) dataset-prompt eval, n=16, stamped
timeout 2400 python -u scripts/eval_conditioning.py evidence_r4 16 25 dpmpp 2.0 \
  docs/eval_conditioning_r4.json 1 zero stamp=1 >> $W 2>&1
echo "$(date -u +%T) eval g2.0 zero rc=$?" >> $W

# 1b. guidance ablation point (g=3.0) for the recipe table
timeout 1800 python -u scripts/eval_conditioning.py evidence_r4 16 25 dpmpp 3.0 \
  docs/eval_conditioning_r4_g3.json 1 zero >> $W 2>&1
echo "$(date -u +%T) eval g3.0 zero rc=$?" >> $W

# 2. name-free paraphrases, NO retrieval seeding (crutch-free)
timeout 1800 python -u scripts/eval_conditioning.py evidence_r4 16 25 dpmpp 2.0 \
  docs/eval_conditioning_paraphrase_r4.json 1 zero prompts=paraphrase >> $W 2>&1
echo "$(date -u +%T) paraphrase eval rc=$?" >> $W

# 3. 8-caption grid + served sprite (quality recipe)
timeout 1800 python -u scripts/ddim_evidence.py evidence_r4 25 \
  docs/samples/dataset_caption_sprites_r4_tpu.png 2.0 dpmpp 1 dataset zero \
  >> $W 2>&1
echo "$(date -u +%T) grid rc=$?" >> $W
timeout 1800 python -u -m psg_tpu.serve.app \
  --prompt "A small yellow electric mouse with red cheeks and a lightning bolt shaped tail" \
  --steps 25 --seed 1234 --sampler dpmpp --guidance 2.0 --negative zero --restarts 1 \
  --experiment-name evidence_r4 \
  --out docs/samples/served_sprite_r4.png \
  --override "$DATA" --override "$IMGS" >> $W 2>&1
echo "$(date -u +%T) served sprite rc=$?" >> $W

# 4. stage 3 at budget on TPU through the CLI chain (BASELINE config 4:
#    final_epochs=20, phase1_epochs=10).  save_every high: 8GB writes
#    take ~10 min through the tunnel (see skills/verify).
timeout 7200 python -u -m psg_tpu.train.cli --stage 3 \
  --config config/r3_evidence.yaml --experiment-name evidence_r4 \
  --vae-checkpoint experiments/evidence_r3c_vae/checkpoints/vae_best_model.ckpt \
  --diffusion-checkpoint experiments/evidence_r4_diffusion/checkpoints/diffusion_best_model.ckpt \
  --override data.batch_size=8 \
  --override training.final_epochs=20 \
  --override training.phase1_epochs=10 \
  --override training.save_every=9999 \
  --override training.sample_every=10 \
  --override training.best_every=5 \
  --override training.val_every=1 >> $W 2>&1
echo "$(date -u +%T) stage3 rc=$?" >> $W

# 5. post-stage-3 conditioning eval (same recipe, stamped) - lets
#    serve/hub rank the final bundle by MEASURED conditioning.  The
#    fresh final bundle has no stamped eval yet so hub would serve the
#    stage-2 pair; extra.serve_prefer_final forces the bundle under test.
timeout 1800 python -u scripts/eval_conditioning.py evidence_r4 16 25 dpmpp 2.0 \
  docs/eval_conditioning_stage3_r4.json 1 zero stamp=1 \
  extra.serve_prefer_final=true >> $W 2>&1
echo "$(date -u +%T) stage3 eval rc=$?" >> $W

# 6. drift replication, second seed (VERDICT weak #3: n>=32 across seeds)
timeout 1800 python -u scripts/eval_conditioning.py evidence_r4 16 25 dpmpp 2.0 \
  docs/eval_conditioning_stage3_r4_seed7.json 1 zero seed=7 \
  extra.serve_prefer_final=true >> $W 2>&1
echo "$(date -u +%T) stage3 eval seed7 rc=$?" >> $W

echo "$(date -u +%T) all done" >> $W
