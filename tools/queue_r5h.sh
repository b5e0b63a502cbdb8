#!/bin/bash
# Round-5 queue (h): sortlite prep A/B (2-operand sort + row gather vs
# 14-operand sort), alone and combined with the pair fold. Baselines
# full_pieces/full_pair come from queue_r5g the same session.
set -u
cd /root/repo
LOG=/tmp/queue_r5h.log
while [ -f /tmp/chip_measure.pid ] && \
      kill -0 "$(cat /tmp/chip_measure.pid)" 2>/dev/null; do
  sleep 45
done
echo $$ > /tmp/chip_measure.pid
echo "=== queue_r5h $(date) ===" >> "$LOG"

run() {
  echo "--- $1 $(date +%H:%M:%S) ---" >> "$LOG"
  shift
  timeout 3600 "$@" 2>&1 | grep -v "WARNING\|cpu_aot" >> "$LOG"
  echo "" >> "$LOG"
}

run "frcnn sortlite prep A/B bs16" \
  python -u -m object_detectors_tpu.analysis.frcnn_ablate --bs 16 \
  --stages full_pieces full_sortlite full_sortlite_pair

rm -f /tmp/chip_measure.pid
echo "=== done $(date) ===" >> "$LOG"
