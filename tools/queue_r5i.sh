#!/bin/bash
# Round-5 queue (i): END-OF-ROUND full bench on the winning defaults
# (after the r5g/r5h A/B decisions are flipped in). One JSON line with
# all five BASELINE configs + MFU; lands in BASELINE.md + BENCH_r05.
set -u
cd /root/repo
LOG=/tmp/queue_r5i.log
while [ -f /tmp/chip_measure.pid ] && \
      kill -0 "$(cat /tmp/chip_measure.pid)" 2>/dev/null; do
  sleep 45
done
echo $$ > /tmp/chip_measure.pid
echo "=== queue_r5i $(date) ===" >> "$LOG"

echo "--- full bench $(date +%H:%M:%S) ---" >> "$LOG"
timeout 5400 python -u bench.py 2>&1 | grep -v "WARNING\|cpu_aot" >> "$LOG"

rm -f /tmp/chip_measure.pid
echo "=== done $(date) ===" >> "$LOG"
