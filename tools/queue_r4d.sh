#!/bin/bash
# Round-4 queue D — pooler budget decomposition (the queue_r4b rows
# that never ran): is the band kernel DMA-bound or VPU-compute-bound,
# and does the mm2 (MXU) fold beat the VPU rows fold? Chains after
# queue_r4c via the chip pidfile.
set -u
cd /root/repo
LOG=/tmp/queue_r4d.log
# serialize strictly AFTER queue_r4c (pidfile-only waits can race when
# two queues poll the same 60s window)
while ! grep -q "=== done" /tmp/queue_r4c.log 2>/dev/null; do
  sleep 60
done
while [ -f /tmp/chip_measure.pid ] && \
      kill -0 "$(cat /tmp/chip_measure.pid)" 2>/dev/null; do
  sleep 60
done
echo $$ > /tmp/chip_measure.pid
echo "=== queue_r4d $(date) ===" >> "$LOG"

run() {
  echo "--- $1 $(date +%H:%M:%S) ---" >> "$LOG"
  shift
  timeout 2700 "$@" 2>&1 | grep -v "WARNING\|cpu_aot" >> "$LOG"
  echo "" >> "$LOG"
}

run "roialign budget" \
  python -m object_detectors_tpu.analysis.roialign_bench \
  --variants noop pallas pallas_mm2 bands bands_dma bands_compute \
             tiled tiled_mm2

rm -f /tmp/chip_measure.pid
echo "=== done $(date) ===" >> "$LOG"
