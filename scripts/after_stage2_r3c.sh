#!/bin/bash
# Round-4 evidence sequence, part 3: runs after the r3c stage-2
# continuation (scripts/stage2_resume_r3c.sh) reaches 675 epochs.
#
#   1. wait for the final periodic checkpoint sidecar (step 60750) and
#      the trainer process to exit; stop the watchdog
#   2. conditioning evals on evidence_r3c (r3b's winning recipe first,
#      stamped into the sidecar so serving resolution ranks by it), then
#      a guidance sweep + true-CFG zero-negative + paraphrases
#   3. dataset-caption sample grid + served sprite through the CLI
#   4. stage 3 at budget on the r3c base through the CLI chain
#      (BASELINE config 4; the joint phase exercises the tracer-leak fix)
#   5. post-stage-3 conditioning evals, 2 seeds, recipe-matched
#
# Log: /tmp/after_stage2_r3c.log
set -u
cd /root/repo
W=/tmp/after_stage2_r3c.log
DONE_SIDECAR=experiments/evidence_r3c_diffusion/checkpoints/diffusion_step_00060750.json
DATA="data.csv_path=/root/reference/data/text_description_concat.csv"
IMGS="data.image_dir=/root/reference/data/small_images"
EVAL="python -u scripts/eval_conditioning.py"

echo "$(date -u +%T) waiting for $DONE_SIDECAR" > $W
while [ ! -f "$DONE_SIDECAR" ]; do sleep 60; done
# let the trainer finish its last writes and exit
pid=$(cat /tmp/stage2_r3c2.pid 2>/dev/null)
while [ -n "$pid" ] && [ -d "/proc/$pid" ]; do sleep 15; done
touch /tmp/stage2_watchdog_r3c2.stop
echo "$(date -u +%T) stage 2 complete" >> $W

# 2a. r3b's winning recipe (the apples-to-apples number) — STAMPED
timeout 2400 $EVAL evidence_r3c 16 10 dpmpp 2.0 \
  docs/eval_conditioning_r3c.json 1 mean stamp=1 >> $W 2>&1
echo "$(date -u +%T) eval mean@10 g2 rc=$?" >> $W

# 2b. guidance sweep at the same recipe (is 2.0 still the knee?)
timeout 1800 $EVAL evidence_r3c 16 10 dpmpp 1.5 \
  docs/eval_conditioning_r3c_g15.json 1 mean >> $W 2>&1
echo "$(date -u +%T) eval g1.5 rc=$?" >> $W
timeout 1800 $EVAL evidence_r3c 16 10 dpmpp 3.0 \
  docs/eval_conditioning_r3c_g3.json 1 mean >> $W 2>&1
echo "$(date -u +%T) eval g3 rc=$?" >> $W

# 2c. true CFG against the trained unconditional branch (cond_dropout)
timeout 1800 $EVAL evidence_r3c 16 10 dpmpp 2.0 \
  docs/eval_conditioning_r3c_zero.json 1 zero >> $W 2>&1
echo "$(date -u +%T) eval zero-neg rc=$?" >> $W

# 2d. paraphrases (no caption augmentation in this run: the honest
#     no-crutch wording-generalization number for the de-confounded base)
timeout 2400 $EVAL evidence_r3c 16 25 dpmpp 2.0 \
  docs/eval_conditioning_paraphrase_r3c.json 1 mean prompts=paraphrase >> $W 2>&1
echo "$(date -u +%T) paraphrase rc=$?" >> $W

# 3. served sprite via the serving CLI (quality recipe)
timeout 1800 python -u -m psg_tpu.serve.app \
  --prompt "A small yellow electric mouse with red cheeks and a lightning bolt shaped tail" \
  --steps 25 --seed 1234 --sampler dpmpp --guidance 2.0 --negative mean --restarts 1 \
  --experiment-name evidence_r3c \
  --out docs/samples/served_sprite_r3c.png \
  --override "$DATA" --override "$IMGS" >> $W 2>&1
echo "$(date -u +%T) served sprite rc=$?" >> $W

# 4. stage 3 at budget on TPU through the CLI chain (BASELINE config 4)
timeout 14400 python -u -m psg_tpu.train.cli --stage 3 \
  --config config/r3_evidence.yaml --experiment-name evidence_r3c \
  --vae-checkpoint experiments/evidence_r3c_vae/checkpoints/vae_best_model.ckpt \
  --diffusion-checkpoint experiments/evidence_r3c_diffusion/checkpoints/diffusion_best_model.ckpt \
  --override data.batch_size=8 \
  --override training.final_epochs=20 \
  --override training.phase1_epochs=10 \
  --override training.save_every=9999 \
  --override training.sample_every=10 \
  --override training.best_every=5 \
  --override training.val_every=1 >> $W 2>&1
echo "$(date -u +%T) stage3 rc=$?" >> $W

# 5. post-stage-3 conditioning evals (2 seeds, recipe-matched to 2a,
#    stamped so the final bundle only shadows on measured merit)
timeout 1800 $EVAL evidence_r3c 16 10 dpmpp 2.0 \
  docs/eval_conditioning_stage3_r3c.json 1 mean stamp=1 \
  extra.serve_prefer_final=true >> $W 2>&1
echo "$(date -u +%T) stage3 eval rc=$?" >> $W
timeout 1800 $EVAL evidence_r3c 16 10 dpmpp 2.0 \
  docs/eval_conditioning_stage3_r3c_seed7.json 1 mean seed=7 \
  extra.serve_prefer_final=true >> $W 2>&1
echo "$(date -u +%T) stage3 eval seed7 rc=$?" >> $W

echo "$(date -u +%T) all done" >> $W
