#!/bin/bash
# Round-4 queue C (re-trimmed for the final wall-clock window), value
# order — results are read from /tmp/queue_r4c.log and committed into
# BASELINE.md as they land:
#  1. retinanet post budget: select / cap / full (also verifies
#     retinanet640 after the NMS-unroll + 2-bit-radix commits)
#  2. train-step fwd/bwd budget (VERDICT item 4)
#  3. frcnn full + leave-one-out pooler marginal
#  4. pooler decomposition (bands dma vs compute)
set -u
cd /root/repo
LOG=/tmp/queue_r4c.log
while [ -f /tmp/chip_measure.pid ] && \
      kill -0 "$(cat /tmp/chip_measure.pid)" 2>/dev/null; do
  sleep 45
done
echo $$ > /tmp/chip_measure.pid
echo "=== queue_r4c $(date) ===" >> "$LOG"

run() {
  echo "--- $1 $(date +%H:%M:%S) ---" >> "$LOG"
  shift
  timeout 2400 "$@" 2>&1 | grep -v "WARNING\|cpu_aot" >> "$LOG"
  echo "" >> "$LOG"
}

run "retinanet ablate bs16 (backbone/head cached; post stages fresh)" \
  python -m object_detectors_tpu.analysis.retinanet_ablate --bs 16 \
  --stages backbone head post_select post_cap full

run "train ablate bs16" \
  python -m object_detectors_tpu.analysis.train_ablate --bs 16

run "frcnn pooler marginal bs16" \
  python -m object_detectors_tpu.analysis.frcnn_ablate --bs 16 \
  --stages full full_no_pooler

run "roialign decomposition" \
  python -m object_detectors_tpu.analysis.roialign_bench \
  --variants pallas bands bands_dma bands_compute

rm -f /tmp/chip_measure.pid
echo "=== done $(date) ===" >> "$LOG"
