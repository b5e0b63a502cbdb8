#!/bin/bash
# Round-4 session-5 queue (c): full reference protocol ladder
# bs {2..128} x2 runs (VERDICT r3 item 7) — replaces the 2-row CSV.
# Waits for queue_r4i via its "=== done" log line (pidfile races:
# CLAUDE.md round-4 gotcha).
set -u
cd /root/repo
LOG=/tmp/queue_r4j.log
until grep -q "=== done" /tmp/queue_r4i.log 2>/dev/null; do
  sleep 60
done
while [ -f /tmp/chip_measure.pid ] && \
      kill -0 "$(cat /tmp/chip_measure.pid)" 2>/dev/null; do
  sleep 45
done
echo $$ > /tmp/chip_measure.pid
echo "=== queue_r4j $(date) ===" >> "$LOG"
echo "--- protocol ladder $(date +%H:%M:%S) ---" >> "$LOG"
timeout 5400 python bench.py --protocol 2>&1 \
  | grep -v "WARNING\|cpu_aot" >> "$LOG"
rm -f /tmp/chip_measure.pid
echo "=== done $(date) ===" >> "$LOG"
