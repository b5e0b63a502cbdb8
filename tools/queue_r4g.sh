#!/bin/bash
# Round-4 session-4 queue: (1) decode micro-bench fused/split/arith,
# (2) retinanet full bs16 with the arith-anchor (grids) decode wired in.
set -u
cd /root/repo
LOG=/tmp/queue_r4g.log
while [ -f /tmp/chip_measure.pid ] && \
      kill -0 "$(cat /tmp/chip_measure.pid)" 2>/dev/null; do
  sleep 45
done
echo $$ > /tmp/chip_measure.pid
echo "=== queue_r4g $(date) ===" >> "$LOG"

run() {
  echo "--- $1 $(date +%H:%M:%S) ---" >> "$LOG"
  shift
  timeout 2400 "$@" 2>&1 | grep -v "WARNING\|cpu_aot" >> "$LOG"
  echo "" >> "$LOG"
}

run "decode micro-bench bs16" \
  python -m object_detectors_tpu.analysis.decode_bench --bs 16

run "retinanet full bs16 (arith-anchor decode)" \
  python -m object_detectors_tpu.analysis.retinanet_ablate --bs 16 \
  --stages full

rm -f /tmp/chip_measure.pid
echo "=== done $(date) ===" >> "$LOG"
