#!/bin/bash
# Round-5 part E: replication seeds for the DATASET-prompt conditioning
# eval (part C stamps seed 1234 only; the pooled binomial test in
# scripts/eval_table.py needs independent seeds to reach p<0.05 at
# realistic retrieval rates — VERDICT r5 #2).  Arms on part D's
# completion; clock-gated against the same T0+8h hard end.
#
# Usage: nohup bash scripts/chain_r5e.sh & ; log: /tmp/chain_r5e.log
set -u
cd /root/repo
W=/tmp/chain_r5e.log
EVAL="python -u scripts/eval_conditioning.py"
[ -s /tmp/round_t0 ] || { echo "FATAL: no /tmp/round_t0"; exit 1; }
HARD_END=$(( $(cat /tmp/round_t0) + 28800 ))
left() { echo $(( HARD_END - $(date +%s) )); }

echo "$(date -u +%T) chain_r5e armed, waiting for part D (left $(left)s)" > "$W"
while ! grep -q "all done" /tmp/chain_r5d.log 2>/dev/null; do sleep 60; done
echo "$(date -u +%T) part D done, left $(left)s" >> "$W"

if [ "$(left)" -gt 2400 ]; then
  timeout 2400 $EVAL evidence_r5c 16 10 dpmpp 2.0 \
    docs/eval_conditioning_r5c_seed7.json 1 mean seeds=7,42,123 >> "$W" 2>&1
  echo "$(date -u +%T) eval_dataset_seeds rc=$? left=$(left)s" >> "$W"
fi

echo "$(date -u +%T) all done, left $(left)s" >> "$W"
