#!/bin/bash
# Round-4 rebuild chain, third launch: the host was replaced twice this
# round and every gitignored checkpoint was lost both times, so the
# r3d-recipe endpoint is trained from scratch as `evidence_r4d`
# (stage 1 relaunched by hand each time — it is bit-deterministic and
# replicates the committed evidence logs):
#
#   1. wait for the stage-1 VAE (60 epochs) to finish,
#   2. stage-2 at 560 epochs (~50.4k steps; 83% of the r3b/r3c 675-epoch
#      budget — shortened to fit what is left of the round's wall clock
#      after the two machine replacements; r3c's committed trajectory
#      puts the val-loss cost of stopping at 50k vs 61k steps at ~0.001)
#      with the r3d recipe: cond_dropout=0.1 + snr_gamma=5.0 +
#      name-preserving caption augmentation (caption_augment=4,
#      caption_name_drop=0.0),
#   3. stamped dataset-caption eval, then name-free paraphrase eval at
#      two seeds in ONE process (seeds=1234,7 reuses the compiled
#      generator) for the pooled binomial test (eval_table.py --pool).
#
# Stage 3 + bench are driven interactively after this if time remains.
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

step stage2_r4d 7800 python -u -m psg_tpu.train.cli --stage 2 \
  --config config/r3_evidence.yaml --experiment-name evidence_r4d \
  --vae-checkpoint "$VAE" \
  --override data.batch_size=8 \
  --override training.diffusion_epochs=560 \
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
# then name-free paraphrases at two seeds pooled from one compile.
step eval_dataset 2700 $EVAL evidence_r4d 16 10 dpmpp 2.0 \
  docs/eval_conditioning_r4d.json 1 mean stamp=1
step eval_paraphrase 2700 $EVAL evidence_r4d 16 25 dpmpp 2.0 \
  docs/eval_conditioning_paraphrase_r4d.json 1 mean \
  prompts=paraphrase seeds=1234,7

echo "$(date -u +%T) all done" >> "$W"
