#!/bin/bash
# Round-4 evidence sequence, part 2 (replaces the tail of
# after_stage2_r4.sh after its step-1/2 zero-negative evals came back at
# retrieval@1 = 0.0).  The r3b recipe that scored 0.375 @ n=16 used
# negative=mean + dpmpp@10 + restart1 (docs/eval_conditioning_n16.json);
# the chain's evals changed BOTH checkpoint and recipe.  Before spending
# 2h of TPU on stage 3 we de-confound: same checkpoint, r3b's recipe.
#
#   1. wait for the in-flight caption grid (PID $1) to exit
#   2. recipe-matched evals on evidence_r4 (negative=mean), stamped
#   3. served sprite (quality recipe, mean negative)
#   4. stage 3 at budget on TPU via the CLI chain      [VERDICT #2]
#   5. post-stage-3 conditioning evals, 2 seeds, same recipe as (2a)
#      so the drift comparison is apples-to-apples     [VERDICT #3]
set -u
cd /root/repo
W=/tmp/after_grid_r4.log
GRID_PID=${1:-0}
echo "$(date -u +%T) start (waiting on grid pid $GRID_PID)" > $W
while [ "$GRID_PID" != "0" ] && [ -d "/proc/$GRID_PID" ]; do sleep 10; done
echo "$(date -u +%T) grid done" >> $W
DATA="data.csv_path=/root/reference/data/text_description_concat.csv"
IMGS="data.image_dir=/root/reference/data/small_images"

# 2a. r3b's exact winning recipe on the r4 checkpoint (the de-confounder)
timeout 1800 python -u scripts/eval_conditioning.py evidence_r4 16 10 dpmpp 2.0 \
  docs/eval_conditioning_r4_mean10.json 1 mean stamp=1 >> $W 2>&1
echo "$(date -u +%T) eval mean@10 rc=$?" >> $W

# 2b. same negative at the chain's 25-step point (isolates the step count)
timeout 2400 python -u scripts/eval_conditioning.py evidence_r4 16 25 dpmpp 2.0 \
  docs/eval_conditioning_r4_mean25.json 1 mean >> $W 2>&1
echo "$(date -u +%T) eval mean@25 rc=$?" >> $W

# 2c. paraphrases under the mean recipe: did caption augmentation buy
#     wording generalization once the known-good recipe is used? [VERDICT #4]
timeout 2400 python -u scripts/eval_conditioning.py evidence_r4 16 25 dpmpp 2.0 \
  docs/eval_conditioning_paraphrase_r4_mean.json 1 mean prompts=paraphrase >> $W 2>&1
echo "$(date -u +%T) paraphrase mean rc=$?" >> $W

# 3. served sprite through the CLI (quality recipe)
timeout 1800 python -u -m psg_tpu.serve.app \
  --prompt "A small yellow electric mouse with red cheeks and a lightning bolt shaped tail" \
  --steps 25 --seed 1234 --sampler dpmpp --guidance 2.0 --negative mean --restarts 1 \
  --experiment-name evidence_r4 \
  --out docs/samples/served_sprite_r4.png \
  --override "$DATA" --override "$IMGS" >> $W 2>&1
echo "$(date -u +%T) served sprite rc=$?" >> $W

# 4. stage 3 at budget on TPU through the CLI chain (BASELINE config 4:
#    final_epochs=20, phase1_epochs=10).  save_every high: 8GB writes
#    take ~10 min through the tunnel (see skills/verify).
timeout 10800 python -u -m psg_tpu.train.cli --stage 3 \
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

# 5. post-stage-3 conditioning eval, same recipe as 2a so serve/hub and
#    the drift question compare like with like; second seed replicates.
timeout 1800 python -u scripts/eval_conditioning.py evidence_r4 16 10 dpmpp 2.0 \
  docs/eval_conditioning_stage3_r4.json 1 mean stamp=1 \
  extra.serve_prefer_final=true >> $W 2>&1
echo "$(date -u +%T) stage3 eval rc=$?" >> $W
timeout 1800 python -u scripts/eval_conditioning.py evidence_r4 16 10 dpmpp 2.0 \
  docs/eval_conditioning_stage3_r4_seed7.json 1 mean seed=7 \
  extra.serve_prefer_final=true >> $W 2>&1
echo "$(date -u +%T) stage3 eval seed7 rc=$?" >> $W

echo "$(date -u +%T) all done" >> $W
