#!/bin/bash
# Round-4 closing-session rebuild (fourth launch of the r4d chain): the
# host was replaced yet again between sessions and all gitignored
# checkpoints were lost, so serving/bench would fall back to random
# weights.  This chain restores real weights inside a ~50-minute window:
#
#   1. wait for the hand-launched stage-1 VAE (60 epochs, bit-deterministic
#      — epoch losses must replicate experiments/evidence_r4d_vae/logs),
#   2. stage-2 with the r4d recipe (cond_dropout=0.1 + snr_gamma=5.0 +
#      name-preserving caption augmentation) for as many epochs as fit
#      before the DEADLINE; best_every=10 so a usable best_model.ckpt
#      lands early and is refreshed often,
#   3. kill stage 2 at the deadline so the end-of-round bench gets the
#      TPU to itself.
#
# Log: /tmp/chain_r4e.log
set -u
cd /root/repo
W=/tmp/chain_r4e.log
VAE=experiments/evidence_r4d_vae/checkpoints/vae_best_model.ckpt
# set -u does not catch EMPTY files: an empty $(cat) would make DEADLINE
# evaluate relative to epoch 0 and silently skip stage 2 (ADVICE r4)
[ -s /tmp/round_t0 ] || { echo "FATAL: no /tmp/round_t0"; exit 1; }
[ -s /tmp/stage1_r4e.pid ] || { echo "FATAL: no /tmp/stage1_r4e.pid"; exit 1; }
DEADLINE=$(( $(cat /tmp/round_t0) + 2820 ))   # T0 + 47 min: TPU freed here

left() { echo $(( DEADLINE - $(date -u +%s) )); }

echo "$(date -u +%T) waiting for stage-1 pid $(cat /tmp/stage1_r4e.pid)" > "$W"
while kill -0 "$(cat /tmp/stage1_r4e.pid)" 2>/dev/null; do sleep 20; done
if [ ! -f "$VAE" ]; then
  echo "$(date -u +%T) FATAL: stage-1 finished without $VAE" >> "$W"
  exit 1
fi
echo "$(date -u +%T) stage 1 done ($(left)s to deadline), launching stage 2" >> "$W"

T2=$(left)
if [ "$T2" -lt 480 ]; then
  echo "$(date -u +%T) <8 min left, skipping stage 2" >> "$W"
  exit 0
fi
timeout "$T2" python -u -m psg_tpu.train.cli --stage 2 \
  --config config/r3_evidence.yaml --experiment-name evidence_r4d \
  --vae-checkpoint "$VAE" \
  --override data.batch_size=8 \
  --override training.diffusion_epochs=560 \
  --override training.save_every=9999 \
  --override training.sample_every=100 \
  --override training.best_every=10 \
  --override training.val_every=5 \
  --override extra.cond_dropout=0.1 \
  --override extra.snr_gamma=5.0 \
  --override extra.caption_augment=4 \
  --override extra.caption_name_drop=0.0 \
  --override extra.sample_guidance=2.0 >> "$W" 2>&1
echo "$(date -u +%T) stage 2 rc=$? (deadline-bounded), TPU free" >> "$W"
