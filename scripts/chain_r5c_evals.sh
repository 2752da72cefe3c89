#!/bin/bash
# Replacement for chain_r5c_resume.sh's eval tail: the first dataset-eval
# attempt hung in the tunnel-RPC layer (process alive, CPU time frozen at
# 47s for 15+ min — the same axon hang the stage-2 legs hit at epochs 199
# and 247).  The resume leg's bare `step` has no liveness check, so a hang
# burns the full 2700 s timeout.  This runner adds the missing recovery:
#
#   - per-attempt liveness probe: kill the eval if its *CPU time* stops
#     advancing for 6 consecutive minutes (an eval prints nothing until
#     the end, so log mtime can't be the signal here);
#   - up to 3 attempts per eval step;
#   - then appends "all done" to /tmp/chain_r5c.log so the already-armed
#     scripts/chain_r5d.sh proceeds exactly as planned.
set -u
cd /root/repo
W=/tmp/chain_r5c.log
EVAL="python -u scripts/eval_conditioning.py"

cputime() {  # total jiffies of pid $1 (utime+stime)
  awk '{print $14+$15}' /proc/$1/stat 2>/dev/null || echo -1
}

run_eval() {  # run_eval <name> <out.json> <args...>
  local name=$1 out=$2; shift 2
  local attempt=0
  while [ $attempt -lt 3 ]; do
    attempt=$((attempt+1))
    echo "$(date -u +%T) $name attempt $attempt" >> "$W"
    timeout 2700 $EVAL "$@" >> "$W" 2>&1 &
    local tpid=$!
    # liveness: CPU time must advance at least once per 6-min window
    local last=-2 stale=0
    while kill -0 "$tpid" 2>/dev/null; do
      sleep 60
      # find the python child of timeout (or timeout itself if exec'd)
      local py c
      py=$(ps --ppid "$tpid" -o pid= 2>/dev/null | head -1 | tr -d ' ')
      [ -n "${py:-}" ] || py=$tpid
      c=$(cputime "$py")
      if [ "$c" = "$last" ]; then
        stale=$((stale+1))
      else
        stale=0; last=$c
      fi
      if [ $stale -ge 6 ]; then
        echo "$(date -u +%T) $name attempt $attempt: CPU frozen ${stale}m - killing" >> "$W"
        kill "$py" "$tpid" 2>/dev/null; sleep 5
        kill -9 "$py" "$tpid" 2>/dev/null
        break
      fi
    done
    wait "$tpid" 2>/dev/null
    rc=$?
    echo "$(date -u +%T) $name attempt $attempt rc=$rc" >> "$W"
    [ -s "$out" ] && { echo "$(date -u +%T) $name done -> $out" >> "$W"; return 0; }
  done
  echo "$(date -u +%T) $name FAILED after 3 attempts" >> "$W"
  return 1
}

run_eval eval_dataset_c docs/eval_conditioning_r5c.json \
  evidence_r5c 16 10 dpmpp 2.0 docs/eval_conditioning_r5c.json 1 mean stamp=1
run_eval eval_paraphrase_c docs/eval_conditioning_paraphrase_r5c.json \
  evidence_r5c 16 25 dpmpp 2.0 docs/eval_conditioning_paraphrase_r5c.json 1 mean \
  prompts=paraphrase seeds=1234,7

echo "$(date -u +%T) all done" >> "$W"
