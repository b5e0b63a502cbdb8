#!/bin/bash
# Round-4 session-5 queue (g): chip A/Bs after the full bench — NMS
# unroll/chunk in the RPN filter, pooler prep after the packed
# scatter, frcnn full with everything landed.
set -u
cd /root/repo
LOG=/tmp/queue_r4n.log
until grep -q "=== done" /tmp/queue_r4l.log 2>/dev/null; do
  sleep 60
done
while [ -f /tmp/chip_measure.pid ] && \
      kill -0 "$(cat /tmp/chip_measure.pid)" 2>/dev/null; do
  sleep 45
done
echo $$ > /tmp/chip_measure.pid
echo "=== queue_r4n $(date) ===" >> "$LOG"

run() {
  echo "--- $1 $(date +%H:%M:%S) ---" >> "$LOG"
  shift
  timeout 3000 "$@" 2>&1 | grep -v "WARNING\|cpu_aot" >> "$LOG"
  echo "" >> "$LOG"
}

run "frcnn filter nms unroll/chunk A/B bs16" \
  python -m object_detectors_tpu.analysis.frcnn_ablate --bs 16 \
  --stages filter_nms filter_nms_u4 filter_nms_c512

run "grouped pooler prep after packed scatter bs16 512 rois" \
  python -m object_detectors_tpu.analysis.roialign_bench --bs 16 \
  --rois 512 --variants prep_grouped grouped_rows

run "frcnn full bs16 (packed prep landed)" \
  python -m object_detectors_tpu.analysis.frcnn_ablate --bs 16 \
  --stages full

rm -f /tmp/chip_measure.pid
echo "=== done $(date) ===" >> "$LOG"
