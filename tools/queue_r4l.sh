#!/bin/bash
# Round-4 session-5 queue (e): serving flush sweep + the end-of-round
# full bench (all 5 BASELINE configs), chip exclusive, CPU quiet.
set -u
cd /root/repo
LOG=/tmp/queue_r4l.log
until grep -q "=== done" /tmp/queue_r4k.log 2>/dev/null; do
  sleep 60
done
while [ -f /tmp/chip_measure.pid ] && \
      kill -0 "$(cat /tmp/chip_measure.pid)" 2>/dev/null; do
  sleep 45
done
echo $$ > /tmp/chip_measure.pid
echo "=== queue_r4l $(date) ===" >> "$LOG"

run() {
  echo "--- $1 $(date +%H:%M:%S) ---" >> "$LOG"
  shift
  timeout 3000 "$@" 2>&1 | grep -v "WARNING\|cpu_aot" >> "$LOG"
  echo "" >> "$LOG"
}

run "serving ablate yolo64 retina16" \
  python -m object_detectors_tpu.analysis.serving_ablate \
  --yolo-bs 64 --retina-bs 16

run "serving ablate yolo32 retina8 (current prod)" \
  python -m object_detectors_tpu.analysis.serving_ablate \
  --yolo-bs 32 --retina-bs 8

run "full bench" \
  python bench.py --full

rm -f /tmp/chip_measure.pid
echo "=== done $(date) ===" >> "$LOG"
