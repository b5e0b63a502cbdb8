#!/bin/bash
# Round-4 session-5 queue (b): validate the 4x4 phase-split stem in
# the full models + split the RPN proposal filter.
set -u
cd /root/repo
LOG=/tmp/queue_r4i.log
while [ -f /tmp/chip_measure.pid ] && \
      kill -0 "$(cat /tmp/chip_measure.pid)" 2>/dev/null; do
  sleep 45
done
echo $$ > /tmp/chip_measure.pid
echo "=== queue_r4i $(date) ===" >> "$LOG"

run() {
  echo "--- $1 $(date +%H:%M:%S) ---" >> "$LOG"
  shift
  timeout 2400 "$@" 2>&1 | grep -v "WARNING\|cpu_aot" >> "$LOG"
  echo "" >> "$LOG"
}

run "frcnn stages bs16 (stem4 + filter split)" \
  python -m object_detectors_tpu.analysis.frcnn_ablate --bs 16 \
  --stages backbone rpn_head filter_topk filter_nms proposal_filter \
  full

run "retinanet backbone+full bs16 (stem4)" \
  python -m object_detectors_tpu.analysis.retinanet_ablate --bs 16 \
  --stages backbone full

run "yolo train ablate bs128" \
  python -m object_detectors_tpu.analysis.train_ablate --bs 128

rm -f /tmp/chip_measure.pid
echo "=== done $(date) ===" >> "$LOG"
