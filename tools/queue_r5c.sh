#!/bin/bash
# Round-5 queue (c): FRCNN IN-GRAPH pooler attribution — the r4 puzzle
# is in-graph marginal 16.4 ms vs isolated kernel 9.3 ms; these stages
# strip pooler compute / DMA inside the otherwise-real graph and A/B
# xalign=16 in context (VERDICT r5 item 1 groundwork).
set -u
cd /root/repo
LOG=/tmp/queue_r5c.log
until grep -q "=== done" /tmp/queue_r5b.log 2>/dev/null; do
  sleep 60
done
while [ -f /tmp/chip_measure.pid ] && \
      kill -0 "$(cat /tmp/chip_measure.pid)" 2>/dev/null; do
  sleep 45
done
echo $$ > /tmp/chip_measure.pid
echo "=== queue_r5c $(date) ===" >> "$LOG"

run() {
  echo "--- $1 $(date +%H:%M:%S) ---" >> "$LOG"
  shift
  timeout 3600 "$@" 2>&1 | grep -v "WARNING\|cpu_aot" >> "$LOG"
  echo "" >> "$LOG"
}

run "frcnn in-graph pooler attribution bs16" \
  python -m object_detectors_tpu.analysis.frcnn_ablate --bs 16 \
  --stages full_pieces full_no_pooler full_pooler_dma \
  full_pooler_compute full_xalign16 full_nofix

rm -f /tmp/chip_measure.pid
echo "=== done $(date) ===" >> "$LOG"
