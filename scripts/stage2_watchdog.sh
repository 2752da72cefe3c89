#!/bin/bash
# Watchdog for the stage-2 evidence run on the tunneled TPU.
#
# The axon client intermittently loses an RPC mid-transfer (observed twice
# this round: device_get hung with all threads in futex_wait and zero
# tunnel traffic).  Training state is recoverable — best-light checkpoints
# land every best_every epochs — so the cure is: detect a stale log,
# kill, resume from the best checkpoint.
#
# The supervised trainer PID is tracked in /tmp/stage2_r3.pid (never kill
# by ps-pattern: other psg_tpu CLI runs — e.g. a CPU stage-3 run — share
# the same command line).
#
# Usage: scripts/stage2_watchdog.sh  (run detached; writes /tmp/watchdog.log)

LOG=experiments/evidence_r3b_diffusion/logs/diffusion.log
BEST=experiments/evidence_r3b_diffusion/checkpoints/diffusion_best_model.ckpt
PIDFILE=/tmp/stage2_r3.pid
STALE=720   # seconds without a log write = hung (relaunch->first epoch
            # line takes ~8 min: frozen-VAE load + remote compile)
WLOG=/tmp/watchdog.log
# Completion is checked only against log bytes written after the current
# launch (the append-across-restarts log may carry an earlier segment's
# completion marker).
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

relaunch() {
  echo "$(date -u +%T) relaunching from $BEST" >> "$WLOG"
  setsid nohup timeout 30000 python -u -m psg_tpu.train.cli --stage 2 \
    --config config/r3_evidence.yaml --experiment-name evidence_r3b \
    --resume "$BEST" \
    --override data.batch_size=8 \
    --override training.diffusion_epochs=1400 \
    --override training.save_every=1400 \
    --override training.sample_every=50 \
    --override training.best_every=50 \
    --override training.val_every=5 \
    --override optimization.learning_rate=0.0002 \
    --override optimization.scheduler=constant \
    --override extra.cond_dropout=0.1 \
    --override extra.snr_gamma=5.0 \
    > /tmp/stage2_r3.out 2>&1 < /dev/null &
  # setsid forks, so $! can be a dead wrapper; resolve the real python
  # pid from /proc (inspection only — never pattern-kill).
  np=""
  for i in $(seq 40); do
    sleep 3
    np=$(find_pid "psg_tpu.train.cli --stage 2" "--experiment-name evidence_r3b") && break
  done
  if [ -n "$np" ]; then
    echo "$np" > "$PIDFILE"
    LOG_OFFSET=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
  else
    echo "$(date -u +%T) ERROR: trainer did not appear within 120s" >> "$WLOG"
    rm -f "$PIDFILE"
  fi
}

kill_trainer() {
  # TERM, poll for exit, and only escalate to KILL if the process is
  # confirmed still alive (SIGKILL on a wrapper orphans the real trainer
  # and double-spawns onto the TPU).
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
  [ -f /tmp/stage2_watchdog.stop ] && { echo "$(date -u +%T) stop requested" >> "$WLOG"; exit 0; }
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
    sleep 540   # grace for load + remote compile before staleness checks
  fi
done
