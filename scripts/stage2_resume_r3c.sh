#!/bin/bash
# Round-4 continuation of the r3c stage-2 run (VERDICT r4 #1, de-confounded).
#
# Context: the evidence_r4 retrain changed THREE things vs r3b at once
# (cond_dropout, snr_gamma, caption_augment w/ name drop 0.5) and its
# conditioning collapsed to retrieval@1 = 0.0 despite a better val loss.
# evidence_r3c is the cond_dropout+snr-only run (150 epochs, 13.5k steps);
# this resumes it to the r3b step budget (675 epochs ~ 61k steps) with NO
# caption augmentation, so the true-CFG recipe is evaluated without the
# augmentation confound.
#
# Same watchdog discipline as stage2_watchdog_r4.sh (pidfile tracking,
# comm-anchored find_pid, TERM-before-KILL, per-segment completion marker).
#
# Usage: scripts/stage2_resume_r3c.sh  (detached; log /tmp/watchdog_r3c2.log)

NAME=evidence_r3c
LOG=experiments/${NAME}_diffusion/logs/diffusion.log
CKPT_DIR=experiments/${NAME}_diffusion/checkpoints
VAE=experiments/evidence_r3c_vae/checkpoints/vae_best_model.ckpt
PIDFILE=/tmp/stage2_r3c2.pid
STALE=720
WLOG=/tmp/watchdog_r3c2.log
EPOCHS=675
LOG_OFFSET=$(stat -c %s "$LOG" 2>/dev/null || echo 0)

find_pid() {
  # match only real python processes (ADVICE r3: the `timeout` wrapper's
  # cmdline contains the same pattern; comm distinguishes them); ALL
  # arguments must appear in the cmdline — callers pass the experiment
  # name so concurrent stage-2 runs never cross-adopt PIDs (review r4)
  for p in /proc/[0-9]*; do
    comm=$(cat "$p/comm" 2>/dev/null)
    case "$comm" in python*) ;; *) continue;; esac
    c=$(tr '\0' ' ' < "$p/cmdline" 2>/dev/null)
    ok=1
    for pat in "$@"; do
      case "$c" in *"$pat"*) ;; *) ok=0; break;; esac
    done
    [ "$ok" = 1 ] && { echo "${p##*/}"; return 0; }
  done
  return 1
}

kill_trainer() {
  pid=$(cat "$PIDFILE" 2>/dev/null)
  if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then
    kill "$pid" 2>/dev/null
    for i in $(seq 10); do
      sleep 2
      kill -0 "$pid" 2>/dev/null || { rm -f "$PIDFILE"; return 0; }
    done
    kill -9 "$pid" 2>/dev/null
  fi
  rm -f "$PIDFILE"
}

relaunch() {
  if ep=$(find_pid "psg_tpu.train.cli --stage 2" "--experiment-name $NAME"); then
    echo "$(date -u +%T) live trainer pid $ep exists - not relaunching" >> "$WLOG"
    echo "$ep" > "$PIDFILE"
    return 0
  fi
  RESUME=$(ls -t "$CKPT_DIR"/diffusion_step_*.ckpt 2>/dev/null | head -1)
  RESUME_ARG=""
  [ -n "$RESUME" ] && RESUME_ARG="--resume $RESUME"
  echo "$(date -u +%T) relaunching (resume: ${RESUME:-none})" >> "$WLOG"
  setsid nohup timeout 30000 python -u -m psg_tpu.train.cli --stage 2 \
    --config config/r3_evidence.yaml --experiment-name $NAME \
    --vae-checkpoint "$VAE" $RESUME_ARG \
    --override data.batch_size=8 \
    --override training.diffusion_epochs=$EPOCHS \
    --override training.save_every=175 \
    --override training.sample_every=100 \
    --override training.best_every=25 \
    --override training.val_every=5 \
    --override extra.cond_dropout=0.1 \
    --override extra.snr_gamma=5.0 \
    --override extra.sample_guidance=2.0 \
    > /tmp/stage2_r3c2.out 2>&1 < /dev/null &
  LOG_OFFSET=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
  np=""
  for i in $(seq 40); do
    sleep 3
    np=$(find_pid "psg_tpu.train.cli --stage 2" "--experiment-name $NAME") && break
  done
  if [ -n "$np" ]; then
    echo "$np" > "$PIDFILE"
    echo "$(date -u +%T) trainer pid $np" >> "$WLOG"
  else
    echo "$(date -u +%T) ERROR: trainer did not appear within 120s" >> "$WLOG"
  fi
}

echo "$(date -u +%T) watchdog up (target $EPOCHS epochs)" > "$WLOG"
relaunch
while true; do
  sleep 60
  [ -f /tmp/stage2_watchdog_r3c2.stop ] && { echo "$(date -u +%T) stop requested" >> "$WLOG"; exit 0; }
  if [ -f "$LOG" ] && tail -c +$((LOG_OFFSET + 1)) "$LOG" | grep -q "stage 2 fast path: .* epochs in"; then
    echo "$(date -u +%T) run complete" >> "$WLOG"
    exit 0
  fi
  last=$(stat -c %Y "$LOG" 2>/dev/null || echo 0); now=$(date +%s)
  if [ $((now - last)) -gt $STALE ]; then
    echo "$(date -u +%T) stale ${STALE}s - restarting" >> "$WLOG"
    kill_trainer
    sleep 3
    relaunch
    sleep 540
  fi
done
