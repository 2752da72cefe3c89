#!/bin/bash
# Watchdog for the round-3 session-7 stage-2 retrain (evidence_r3c).
#
# Same staleness/restart logic as scripts/stage2_watchdog.sh (see its
# header for the RPC-hang rationale); this variant resumes the r3c run,
# which trains the CFG branch from the start (cond_dropout + snr_gamma).
# Never kills by ps-pattern — the trainer PID is tracked in a pidfile.
#
# Usage: scripts/stage2_watchdog_r3c.sh  (run detached; writes /tmp/watchdog_r3c.log)

LOG=experiments/evidence_r3c_diffusion/logs/diffusion.log
BEST=experiments/evidence_r3c_diffusion/checkpoints/diffusion_best_model.ckpt
PIDFILE=/tmp/stage2_r3c.pid
STALE=720
WLOG=/tmp/watchdog_r3c.log

relaunch() {
  echo "$(date -u +%T) relaunching from $BEST" >> "$WLOG"
  setsid nohup timeout 30000 python -u -m psg_tpu.train.cli --stage 2 \
    --config config/r3_evidence.yaml --experiment-name evidence_r3c \
    --resume "$BEST" \
    --override data.batch_size=8 \
    --override training.diffusion_epochs=1200 \
    --override training.save_every=9999 \
    --override training.sample_every=1200 \
    --override training.best_every=25 \
    --override training.val_every=5 \
    --override optimization.learning_rate=0.0002 \
    --override optimization.scheduler=constant \
    --override extra.cond_dropout=0.1 \
    --override extra.snr_gamma=5.0 \
    > /tmp/stage2_r3c.out 2>&1 < /dev/null &
  # setsid forks when launched from a background job, so $! may be a dead
  # wrapper; resolve the real python pid from /proc (inspection only —
  # never pattern-kill)
  for i in $(seq 40); do
    sleep 3
    np=$(find_pid "psg_tpu.train.cli --stage 2")
    [ -n "$np" ] && break
  done
  echo "${np#/proc/}" > "$PIDFILE"
}

find_pid() {
  for p in /proc/[0-9]*/cmdline; do
    c=$(tr '\0' ' ' < "$p" 2>/dev/null)
    case "$c" in *"$1"*) echo "${p%/cmdline}"; return 0;; esac
  done
  return 1
}

kill_trainer() {
  pid=$(cat "$PIDFILE" 2>/dev/null)
  if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then
    kill "$pid" 2>/dev/null
    sleep 5
    kill -9 "$pid" 2>/dev/null
  fi
}

while true; do
  sleep 60
  [ -f /tmp/stage2_watchdog_r3c.stop ] && { echo "$(date -u +%T) stop requested" >> "$WLOG"; exit 0; }
  if grep -q "stage 2 fast path: .* epochs in" "$LOG" 2>/dev/null; then
    last=$(stat -c %Y "$LOG"); now=$(date +%s)
    if [ $((now - last)) -gt 600 ]; then
      echo "$(date -u +%T) run complete" >> "$WLOG"; exit 0
    fi
  fi
  last=$(stat -c %Y "$LOG" 2>/dev/null || echo 0); now=$(date +%s)
  if [ $((now - last)) -gt $STALE ]; then
    echo "$(date -u +%T) stale ${STALE}s — restarting" >> "$WLOG"
    kill_trainer
    sleep 3
    relaunch
    sleep 540
  fi
done
