#!/bin/bash
# Round-4 session-2, part 2: fires after scripts/chain_r4d.sh writes its
# "all done" marker.
#
#   1. stage 3 at budget on TPU through the CLI chain on the evidence_r4d
#      base (BASELINE config 4: final_epochs=20, phase switch @10)
#      — reference: train_3stage.py:98-188, final_trainer.py:590-642,
#   2. post-stage-3 conditioning eval, stamped, with
#      extra.serve_prefer_final so the fresh bundle is the one under
#      test (hub only serves it by default if measured not-worse),
#   3. a full serving-CLI drive on the trained checkpoints (the /verify
#      TPU surface): one sprite through the quality recipe.
#
# Log: /tmp/after_chain_r4d.log
set -u
cd /root/repo
W=/tmp/after_chain_r4d.log
EVAL="python -u scripts/eval_conditioning.py"

step() {  # step <name> <timeout> <cmd...>
  local name=$1 t=$2; shift 2
  timeout "$t" "$@" >> "$W" 2>&1
  local rc=$?
  echo "$(date -u +%T) $name rc=$rc" >> "$W"
}

echo "$(date -u +%T) waiting for chain_r4d" > "$W"
while ! grep -q "all done" /tmp/chain_r4d.log 2>/dev/null; do sleep 60; done
echo "$(date -u +%T) chain done, TPU free" >> "$W"

step stage3_r4d 7200 python -u -m psg_tpu.train.cli --stage 3 \
  --config config/r3_evidence.yaml --experiment-name evidence_r4d \
  --vae-checkpoint experiments/evidence_r4d_vae/checkpoints/vae_best_model.ckpt \
  --diffusion-checkpoint experiments/evidence_r4d_diffusion/checkpoints/diffusion_best_model.ckpt \
  --override data.batch_size=8 \
  --override training.final_epochs=20 \
  --override training.phase1_epochs=10 \
  --override training.save_every=9999 \
  --override training.sample_every=10 \
  --override training.best_every=5 \
  --override training.val_every=1

step stage3_eval 3600 $EVAL evidence_r4d 16 10 dpmpp 2.0 \
  docs/eval_conditioning_stage3_r4d.json 1 mean stamp=1 \
  extra.serve_prefer_final=true

step serve_drive 3600 python -m psg_tpu.serve.app \
  --prompt "A small green quadruped creature with a plant bulb on its back" \
  --steps 25 --sampler dpmpp --guidance 2.0 --seed 42 \
  --out docs/samples/served_sprite_r4d.png \
  --override data.csv_path=/root/reference/data/text_description_concat.csv \
  --override data.image_dir=/root/reference/data/small_images

echo "$(date -u +%T) all done" >> "$W"
