#!/bin/bash
# Round-4 session-5 queue (d): fixed frcnn filter split + stem4
# detail, then the protocol ladder (VERDICT item 7).
set -u
cd /root/repo
LOG=/tmp/queue_r4k.log
until grep -q "=== done" /tmp/queue_r4i.log 2>/dev/null; do
  sleep 60
done
while [ -f /tmp/chip_measure.pid ] && \
      kill -0 "$(cat /tmp/chip_measure.pid)" 2>/dev/null; do
  sleep 45
done
echo $$ > /tmp/chip_measure.pid
echo "=== queue_r4k $(date) ===" >> "$LOG"

run() {
  echo "--- $1 $(date +%H:%M:%S) ---" >> "$LOG"
  shift
  timeout 3000 "$@" 2>&1 | grep -v "WARNING\|cpu_aot" >> "$LOG"
  echo "" >> "$LOG"
}

run "stem4 detail bs16" \
  python -m object_detectors_tpu.analysis.backbone_ablate --bs 16 \
  --stem-detail

run "frcnn stages bs16 (filter split, fixed)" \
  python -m object_detectors_tpu.analysis.frcnn_ablate --bs 16 \
  --stages filter_topk filter_nms proposal_filter full

run "protocol ladder" \
  python bench.py --protocol

rm -f /tmp/chip_measure.pid
echo "=== done $(date) ===" >> "$LOG"
