#!/bin/bash
# Round-4 queue C (trimmed for remaining wall clock) — decision
# measurements in value order:
#  1. retinanet postprocess INTERNAL budget (select/decode/cap/nms)
#  2. train-step fwd/bwd budget (VERDICT item 4)
#  3. frcnn marginal pooler/filter cost (leave-one-out)
#  4. pooler variant decomposition (bands dma vs compute, mm2)
# Waits for the chip (artifact trainer holds chip_measure.pid).
set -u
cd /root/repo
LOG=/tmp/queue_r4c.log
while [ -f /tmp/chip_measure.pid ] && \
      kill -0 "$(cat /tmp/chip_measure.pid)" 2>/dev/null; do
  sleep 60
done
echo $$ > /tmp/chip_measure.pid
echo "=== queue_r4c $(date) ===" >> "$LOG"

run() {
  echo "--- $1 $(date +%H:%M:%S) ---" >> "$LOG"
  shift
  timeout 2700 "$@" 2>&1 | grep -v "WARNING\|cpu_aot" >> "$LOG"
  echo "" >> "$LOG"
}

run "retinanet ablate bs16 post-detail" \
  python -m object_detectors_tpu.analysis.retinanet_ablate --bs 16

run "train ablate bs16" \
  python -m object_detectors_tpu.analysis.train_ablate --bs 16

run "frcnn marginal stages bs16" \
  python -m object_detectors_tpu.analysis.frcnn_ablate --bs 16 \
  --stages full full_no_pooler full_no_filter

run "roialign variant budget" \
  python -m object_detectors_tpu.analysis.roialign_bench \
  --variants noop pallas pallas_mm2 bands bands_dma bands_compute

rm -f /tmp/chip_measure.pid
echo "=== done $(date) ===" >> "$LOG"
