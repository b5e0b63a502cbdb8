#!/bin/bash
# Round-5 queue (f): A/B the scatter-free pooler prep + serving after
# the perlevel-select revert.
#  1. FRCNN: new sort-free prep (default) vs @oldprep, in-graph
#     (full_pieces/full_oldprep) and prep-only attribution both ways.
#     queue_r5e baseline: full 55.0, prep marginal 6.2 ms.
#  2. Serving: run_serving after the retinanet perlevel revert
#     (kernel time dropped ~12%; r4 flush tuning may shift).
set -u
cd /root/repo
LOG=/tmp/queue_r5f.log
while [ -f /tmp/chip_measure.pid ] && \
      kill -0 "$(cat /tmp/chip_measure.pid)" 2>/dev/null; do
  sleep 45
done
echo $$ > /tmp/chip_measure.pid
echo "=== queue_r5f $(date) ===" >> "$LOG"

run() {
  echo "--- $1 $(date +%H:%M:%S) ---" >> "$LOG"
  shift
  timeout 3600 "$@" 2>&1 | grep -v "WARNING\|cpu_aot" >> "$LOG"
  echo "" >> "$LOG"
}

run "frcnn sortfree prep A/B bs16" \
  python -m object_detectors_tpu.analysis.frcnn_ablate --bs 16 \
  --stages full full_pieces full_oldprep full_prep_only \
  full_prep_only_old full_no_pooler

run "serving after perlevel revert" \
  python - <<'EOF'
import json
import bench
v = bench.run_serving()
print(json.dumps({"serving_img_s": round(v, 1)}))
EOF

rm -f /tmp/chip_measure.pid
echo "=== done $(date) ===" >> "$LOG"
