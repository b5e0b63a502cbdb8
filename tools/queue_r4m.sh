#!/bin/bash
# Round-4 session-5 queue (f): CPU-side revalidation AFTER all chip
# measurement queues — parity re-runs for every ResNet-stem model
# (the 4x4 phase-split stem changes conv summation order) + the full
# pytest suite. No chip timing runs concurrently, so contention is
# irrelevant here.
set -u
cd /root/repo
LOG=/tmp/queue_r4m.log
until grep -q "=== done" /tmp/queue_r4n.log 2>/dev/null; do
  sleep 60
done
echo "=== queue_r4m $(date) ===" >> "$LOG"

run() {
  echo "--- $1 $(date +%H:%M:%S) ---" >> "$LOG"
  shift
  timeout 5400 "$@" 2>&1 | tail -40 >> "$LOG"
  echo "" >> "$LOG"
}

for which in frcnn frcnn_trained maskrcnn_trained retinanet \
             keypoint_trained; do
  run "parity $which" python parity/run_parity.py "$which"
done

run "pytest full suite" python -m pytest tests/ -q

echo "=== done $(date) ===" >> "$LOG"
