#!/bin/bash
# Watchdog for the round-4 stage-2 full-budget CFG run (evidence_r4).
#
# The tunneled-TPU RPC layer can hang a training process indefinitely
# (observed round 3); this restarts the trainer from its newest resume
# point when the log goes stale.  Never kills by ps-pattern — the
# trainer PID is tracked in a pidfile.
#
# Fixes the round-3 advisor findings on stage2_watchdog_r3c.sh:
# - find_pid anchors on /proc/PID/comm == python* so the `timeout`
#   wrapper (whose cmdline also contains the pattern) is never recorded;
# - kill -9 fires only if the process survives TERM;
# - an empty find_pid result is an error: nothing is written to the
#   pidfile and relaunch refuses to double-spawn while any live trainer
#   matches in /proc;
# - the completion check reads only log bytes written after the current
#   launch (byte offset captured at watchdog/relaunch start), so a
#   "complete" marker from an earlier segment can't mask a hung resume.
#
# Usage: scripts/stage2_watchdog_r4.sh  (run detached; log /tmp/watchdog_r4.log)

NAME=evidence_r4
LOG=experiments/${NAME}_diffusion/logs/diffusion.log
CKPT_DIR=experiments/${NAME}_diffusion/checkpoints
VAE=experiments/evidence_r3c_vae/checkpoints/vae_best_model.ckpt
PIDFILE=/tmp/stage2_r4.pid
STALE=720
WLOG=/tmp/watchdog_r4.log
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
    kill -9 "$pid" 2>/dev/null  # only after TERM failed
  fi
  rm -f "$PIDFILE"
}

relaunch() {
  # refuse to double-spawn: a live trainer may exist even if the pidfile
  # was lost (ADVICE r3 low #2)
  if ep=$(find_pid "psg_tpu.train.cli --stage 2" "--experiment-name $NAME"); then
    echo "$(date -u +%T) live trainer pid $ep exists - not relaunching" >> "$WLOG"
    echo "$ep" > "$PIDFILE"
    return 0
  fi
  # resume from the newest full (resume-grade) state if one exists;
  # otherwise start fresh
  RESUME=$(ls -t "$CKPT_DIR"/diffusion_step_*.ckpt 2>/dev/null | head -1)
  RESUME_ARG=""
  [ -n "$RESUME" ] && RESUME_ARG="--resume $RESUME"
  echo "$(date -u +%T) relaunching (resume: ${RESUME:-none})" >> "$WLOG"
  setsid nohup timeout 30000 python -u -m psg_tpu.train.cli --stage 2 \
    --config config/r3_evidence.yaml --experiment-name $NAME \
    --vae-checkpoint "$VAE" $RESUME_ARG \
    --override data.batch_size=8 \
    --override training.diffusion_epochs=800 \
    --override training.save_every=200 \
    --override training.sample_every=100 \
    --override training.best_every=25 \
    --override training.val_every=5 \
    --override extra.cond_dropout=0.1 \
    --override extra.snr_gamma=5.0 \
    --override extra.caption_augment=8 \
    --override extra.sample_guidance=2.0 \
    > /tmp/stage2_r4.out 2>&1 < /dev/null &
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
    # startup crash: leave no pidfile; next cycle's relaunch re-checks
    # /proc before spawning again (ADVICE r3 low #1)
    echo "$(date -u +%T) ERROR: trainer did not appear within 120s" >> "$WLOG"
  fi
}

while true; do
  sleep 60
  [ -f /tmp/stage2_watchdog_r4.stop ] && { echo "$(date -u +%T) stop requested" >> "$WLOG"; exit 0; }
  # completion marker must come from THIS run segment (after LOG_OFFSET)
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
