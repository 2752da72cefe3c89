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
# ADVICE r3: completion is checked only against log bytes written after
# the current launch — the append-across-restarts log already contains an
# earlier segment's completion marker.
LOG_OFFSET=$(stat -c %s "$LOG" 2>/dev/null || echo 0)

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
    np=$(find_pid "psg_tpu.train.cli --stage 2" "--experiment-name evidence_r3c")
    [ -n "$np" ] && break
  done
  if [ -n "$np" ]; then
    echo "$np" > "$PIDFILE"
    LOG_OFFSET=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
  else
    # ADVICE r3: an empty pidfile made kill_trainer a no-op forever while
    # every stale cycle spawned another trainer.  Treat it as an error.
    echo "$(date -u +%T) ERROR: trainer did not appear within 120s" >> "$WLOG"
    rm -f "$PIDFILE"
  fi
}

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
  # ADVICE r3: TERM, poll for exit, and only escalate to KILL if the
  # process is confirmed still alive (SIGKILL on a wrapper orphans the
  # real trainer and double-spawns onto the TPU).
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

while true; do
  sleep 60
  [ -f /tmp/stage2_watchdog_r3c.stop ] && { echo "$(date -u +%T) stop requested" >> "$WLOG"; exit 0; }
  if [ -f "$LOG" ] && tail -c +$((LOG_OFFSET + 1)) "$LOG" \
      | grep -q "stage 2 fast path: .* epochs in"; then
    echo "$(date -u +%T) run complete" >> "$WLOG"; exit 0
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
