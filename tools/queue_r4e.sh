#!/bin/bash
# Round-4 session-2 queue: (1) frcnn full graph with the grouped-bands
# pooler default, (2) retinanet post stages after the deferred-decode/
# fused-gather rework, (3) backbone stem detail (stem 5.6 ms vs ~1.5
# roofline), (4) grouped pooler full decomposition at bs16.
set -u
cd /root/repo
LOG=/tmp/queue_r4e.log
while [ -f /tmp/chip_measure.pid ] && \
      kill -0 "$(cat /tmp/chip_measure.pid)" 2>/dev/null; do
  sleep 45
done
echo $$ > /tmp/chip_measure.pid
echo "=== queue_r4e $(date) ===" >> "$LOG"

run() {
  echo "--- $1 $(date +%H:%M:%S) ---" >> "$LOG"
  shift
  timeout 2400 "$@" 2>&1 | grep -v "WARNING\|cpu_aot" >> "$LOG"
  echo "" >> "$LOG"
}

run "frcnn full + pooler marginal bs16 (grouped-bands default)" \
  python -m object_detectors_tpu.analysis.frcnn_ablate --bs 16 \
  --stages full full_no_pooler

run "retinanet post stages bs16 (deferred decode + fused gathers)" \
  python -m object_detectors_tpu.analysis.retinanet_ablate --bs 16 \
  --stages backbone head post_select post_cap full

run "backbone stem detail bs16" \
  python -m object_detectors_tpu.analysis.backbone_ablate --bs 16 \
  --stem-detail

run "grouped pooler bs16 decomposition" \
  python -m object_detectors_tpu.analysis.roialign_bench --bs 16 \
  --variants grouped grouped_dma grouped_compute prep_grouped hybrid_grouped

rm -f /tmp/chip_measure.pid
echo "=== done $(date) ===" >> "$LOG"
