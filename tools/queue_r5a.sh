#!/bin/bash
# Round-5 queue (a): A/B the in-flight r5 perf levers on the chip.
#  1. RetinaNet: fused cls+reg towers + level-batched postprocess
#     (bs16 stage table + bs32 full) vs r4 full 40ms/373.8 img/s.
#  2. FRCNN: level-batched filter topk (rpn.py r5) vs r4 topk 4.6ms.
#  3. Pooler: xalign=16 (bf16-tile-aligned window reads) vs 8.
# Waits for the running pytest to finish first (1-core rig: timings
# under suite load read ~1.2-2x slow — CLAUDE.md r3).
set -u
cd /root/repo
LOG=/tmp/queue_r5a.log
until grep -q "=== done" /tmp/pytest_r5a.log 2>/dev/null; do
  sleep 60
done
while [ -f /tmp/chip_measure.pid ] && \
      kill -0 "$(cat /tmp/chip_measure.pid)" 2>/dev/null; do
  sleep 45
done
echo $$ > /tmp/chip_measure.pid
echo "=== queue_r5a $(date) ===" >> "$LOG"

run() {
  echo "--- $1 $(date +%H:%M:%S) ---" >> "$LOG"
  shift
  timeout 3600 "$@" 2>&1 | grep -v "WARNING\|cpu_aot" >> "$LOG"
  echo "" >> "$LOG"
}

run "retinanet stages bs16 (fused towers + batched post)" \
  python -m object_detectors_tpu.analysis.retinanet_ablate --bs 16 \
  --stages backbone head head_fused post_select post_decode post_cap \
  full full_fused

run "retinanet full bs32 fused vs not" \
  python -m object_detectors_tpu.analysis.retinanet_ablate --bs 32 \
  --stages full full_fused

run "frcnn filter stages bs16 (batched-level topk)" \
  python -m object_detectors_tpu.analysis.frcnn_ablate --bs 16 \
  --stages filter_topk filter_nms proposal_filter full

run "pooler xalign A/B bs16 512 rois" \
  python -m object_detectors_tpu.analysis.roialign_bench --bs 16 \
  --rois 512 --variants grouped_rows grouped_rows_a16 \
  grouped_a16_dma grouped_a16_compute

rm -f /tmp/chip_measure.pid
echo "=== done $(date) ===" >> "$LOG"
