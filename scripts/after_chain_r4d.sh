#!/bin/bash
# Round-4, part 2 (rewritten for the post-replacement clock): fires after
# scripts/chain_r4d.sh writes its "all done" marker and lands the round's
# deliverables unattended — this round's interactive sessions were cut
# off repeatedly (two host replacements, API drops), so everything after
# the training chain is self-executing:
#
#   1. pooled exact binomial test over the two paraphrase seed evals
#      (VERDICT #4's p<0.05 bar) -> docs/eval_conditioning_paraphrase_r4d_pooled.txt,
#   2. evidence collection (grids + loss curves) for evidence_r4d,
#   3. one atomic git commit of the stage-2 evidence + eval JSONs,
#   4. a full serving-CLI drive on the trained pair (quality recipe) and
#      a final commit of the served sprite.
#
# Stage 3 at budget on this base does NOT fit the remaining wall clock;
# the stage-3-at-budget evidence for the round lives on the r4 base
# (experiments/evidence_r4_final, docs/eval_conditioning_stage3_r4*).
# Log: /tmp/after_chain_r4d.log
set -u
cd /root/repo
W=/tmp/after_chain_r4d.log

step() {  # step <name> <timeout> <cmd...>
  local name=$1 t=$2; shift 2
  timeout "$t" "$@" >> "$W" 2>&1
  local rc=$?
  echo "$(date -u +%T) $name rc=$rc" >> "$W"
}

echo "$(date -u +%T) waiting for stage 2" > "$W"
while ! grep -q "stage2_r4d rc=" /tmp/chain_r4d.log 2>/dev/null; do sleep 60; done
# Commit the training-run evidence the moment stage 2 ends, BEFORE the
# evals: if the round's clock runs out mid-eval, the run itself is
# already landed atomically.
git add experiments/evidence_r4d_diffusion >> "$W" 2>&1
git commit -q -m "evidence_r4d stage 2 at 560 epochs: run logs and sample grids

r3d recipe (cond_dropout 0.1 + snr_gamma 5.0 + name-preserving caption
augmentation x4, caption_name_drop 0) trained from scratch on the
rebuilt stage-1 VAE; budget trimmed from the 675-epoch r3b/r3c budget to
fit the post-replacement wall clock. Stamped evals follow separately." \
  >> "$W" 2>&1
echo "$(date -u +%T) stage-2 evidence commit rc=$?" >> "$W"

echo "$(date -u +%T) waiting for chain_r4d evals" >> "$W"
while ! grep -q "all done" /tmp/chain_r4d.log 2>/dev/null; do sleep 60; done
echo "$(date -u +%T) chain done, TPU free" >> "$W"

step pool 300 bash -c "python scripts/eval_table.py --pool \
  docs/eval_conditioning_paraphrase_r4d*.json \
  | tee docs/eval_conditioning_paraphrase_r4d_pooled.txt"
step collect 600 python scripts/collect_evidence.py evidence_r4d

git add experiments/evidence_r4d_diffusion experiments/evidence_r4d_vae \
  docs/eval_conditioning_r4d*.json docs/eval_conditioning_paraphrase_r4d* \
  docs/samples >> "$W" 2>&1
git commit -q -m "evidence_r4d conditioning evals: stamped dataset recipe + pooled paraphrases

Dataset-caption eval (dpmpp@10+restart1, g=2, neg=mean) stamped into the
checkpoint sidecar (drives serving/bench resolution); name-free
paraphrase eval replicated at two sampling seeds from one compiled
generator and pooled into one exact binomial test
(docs/eval_conditioning_paraphrase_r4d_pooled.txt)." >> "$W" 2>&1
echo "$(date -u +%T) eval evidence commit rc=$?" >> "$W"

step serve_drive 1800 python -m psg_tpu.serve.app \
  --prompt "A small green quadruped creature with a plant bulb on its back" \
  --steps 25 --sampler dpmpp --guidance 2.0 --seed 42 \
  --out docs/samples/served_sprite_r4d.png \
  --override data.csv_path=/root/reference/data/text_description_concat.csv \
  --override data.image_dir=/root/reference/data/small_images

if [ -f docs/samples/served_sprite_r4d.png ]; then
  git add docs/samples/served_sprite_r4d.png >> "$W" 2>&1
  git commit -q -m "Served sprite through the CLI quality recipe on evidence_r4d" \
    >> "$W" 2>&1
  echo "$(date -u +%T) sprite commit rc=$?" >> "$W"
fi

echo "$(date -u +%T) all done" >> "$W"
