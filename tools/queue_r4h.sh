#!/bin/bash
# Round-4 session-5 queue: (1) grouped pooler wide-fold A/B (one wide
# matmul per RoI vs 7 small ones), (2) yolo train step at bs64 (batch
# amortization of the ~45%-MXU step), (3) frcnn full bs16 with the
# wide fold if (1) wins is run manually after reading this log.
set -u
cd /root/repo
LOG=/tmp/queue_r4h.log
while [ -f /tmp/chip_measure.pid ] && \
      kill -0 "$(cat /tmp/chip_measure.pid)" 2>/dev/null; do
  sleep 45
done
echo $$ > /tmp/chip_measure.pid
echo "=== queue_r4h $(date) ===" >> "$LOG"

run() {
  echo "--- $1 $(date +%H:%M:%S) ---" >> "$LOG"
  shift
  timeout 2400 "$@" 2>&1 | grep -v "WARNING\|cpu_aot" >> "$LOG"
  echo "" >> "$LOG"
}

run "grouped pooler wide-fold A/B bs16 512 rois" \
  python -m object_detectors_tpu.analysis.roialign_bench --bs 16 \
  --rois 512 --variants grouped grouped_rows grouped_wide \
  grouped_wide_compute grouped_compute grouped_dma prep_grouped

run "yolo train ablate bs64" \
  python -m object_detectors_tpu.analysis.train_ablate --bs 64

rm -f /tmp/chip_measure.pid
echo "=== done $(date) ===" >> "$LOG"
