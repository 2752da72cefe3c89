#!/bin/bash
# Round-5 denoise-perf A/B harness (VERDICT r5 #4): runs the raw batch-4
# bench under each kernel/dispatch variant and appends one JSON line per
# variant to /tmp/perf_r5.jsonl.  ~3-6 min per variant (compile + 100-step
# chain x3 reps).  Run ONLY with the TPU free (one process at a time).
set -u
cd /root/repo
OUT=/tmp/perf_r5.jsonl
: > "$OUT"

run() {  # run <label> [ENV=VAL ...]
  local label=$1; shift
  echo "== $label ($*)" >&2
  ( export PSG_TPU_BENCH_RAW=1; export "$@" 2>/dev/null || true
    timeout 900 python bench.py 4 100 ) \
    | sed "s/^{/{\"variant\": \"$label\", /" >> "$OUT"
  tail -1 "$OUT" | python3 -c "import json,sys; d=json.loads(sys.stdin.read()); print(d['variant'], d['value'], 'steps/s')" >&2
}

run baseline PSG_TPU_NOOP=1
run unroll2 PSG_TPU_SCAN_UNROLL=2
run unroll4 PSG_TPU_SCAN_UNROLL=4
run attn_pallas PSG_TPU_ATTN=pallas
run gn_off PSG_TPU_FUSED_GN=off
run gn_on_everywhere PSG_TPU_FUSED_GN=on
run unroll2_attn PSG_TPU_SCAN_UNROLL=2 PSG_TPU_ATTN=pallas

echo "done -> $OUT" >&2
