#!/bin/bash
# Round-4 evidence sequence, part 3b: continuation of
# scripts/after_stage2_r3c.sh after its first eval was killed by a
# too-tight timeout (cold-compile warm-up took ~33 min; warm evals take
# ~7 min).  Differences from part 3:
#   - rc is captured into a variable BEFORE the echo: the original
#     `echo "$(date) rc=$?"` always logged rc=0 because the command
#     substitution clobbers $? first.
#   - the stamped eval gets a 3600s timeout (it is the number serving
#     resolution ranks by; losing it to a timeout is the worst outcome).
#   - waits for the still-running g3.0 eval from part 3 to finish first
#     (TPU is single-user).
# Log: /tmp/after_stage2_r3c2.log
set -u
cd /root/repo
W=/tmp/after_stage2_r3c2.log
DATA="data.csv_path=/root/reference/data/text_description_concat.csv"
IMGS="data.image_dir=/root/reference/data/small_images"
EVAL="python -u scripts/eval_conditioning.py"

step() {  # step <name> <timeout> <cmd...>
  local name=$1 t=$2; shift 2
  timeout "$t" "$@" >> "$W" 2>&1
  local rc=$?
  echo "$(date -u +%T) $name rc=$rc" >> "$W"
}

echo "$(date -u +%T) waiting for part-3 g3.0 eval to exit" > "$W"
while [ -d /proc/11573 ]; do sleep 20; done
echo "$(date -u +%T) TPU free" >> "$W"

# 2a. r3b's winning recipe (the apples-to-apples number) — STAMPED
step eval_g2_stamped 3600 $EVAL evidence_r3c 16 10 dpmpp 2.0 \
  docs/eval_conditioning_r3c.json 1 mean stamp=1

# 2c. true CFG against the trained unconditional branch (cond_dropout)
step eval_zero 1800 $EVAL evidence_r3c 16 10 dpmpp 2.0 \
  docs/eval_conditioning_r3c_zero.json 1 zero

# 2d. paraphrases, no crutch (honest wording-generalization number)
step eval_paraphrase 2400 $EVAL evidence_r3c 16 25 dpmpp 2.0 \
  docs/eval_conditioning_paraphrase_r3c.json 1 mean prompts=paraphrase

# 3. served sprite via the serving CLI (quality recipe)
step served_sprite 1800 python -u -m psg_tpu.serve.app \
  --prompt "A small yellow electric mouse with red cheeks and a lightning bolt shaped tail" \
  --steps 25 --seed 1234 --sampler dpmpp --guidance 2.0 --negative mean --restarts 1 \
  --experiment-name evidence_r3c \
  --out docs/samples/served_sprite_r3c.png \
  --override "$DATA" --override "$IMGS"

# 4. stage 3 at budget on TPU through the CLI chain (BASELINE config 4)
step stage3 14400 python -u -m psg_tpu.train.cli --stage 3 \
  --config config/r3_evidence.yaml --experiment-name evidence_r3c \
  --vae-checkpoint experiments/evidence_r3c_vae/checkpoints/vae_best_model.ckpt \
  --diffusion-checkpoint experiments/evidence_r3c_diffusion/checkpoints/diffusion_best_model.ckpt \
  --override data.batch_size=8 \
  --override training.final_epochs=20 \
  --override training.phase1_epochs=10 \
  --override training.save_every=9999 \
  --override training.sample_every=10 \
  --override training.best_every=5 \
  --override training.val_every=1

# 5. post-stage-3 conditioning evals (2 seeds, recipe-matched to 2a,
#    stamped so the final bundle only shadows on measured merit)
step stage3_eval 2400 $EVAL evidence_r3c 16 10 dpmpp 2.0 \
  docs/eval_conditioning_stage3_r3c.json 1 mean stamp=1 \
  extra.serve_prefer_final=true
step stage3_eval_seed7 2400 $EVAL evidence_r3c 16 10 dpmpp 2.0 \
  docs/eval_conditioning_stage3_r3c_seed7.json 1 mean seed=7 \
  extra.serve_prefer_final=true

echo "$(date -u +%T) all done" >> "$W"
