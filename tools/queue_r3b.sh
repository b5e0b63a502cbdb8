#!/bin/bash
# Round-3 session-B chip queue: the steps the box restart killed.
# Single chip + single CPU core: nothing else heavy may run alongside.
set -u
cd /root/repo
LOG=/tmp/chip_measure.log
echo $$ > /tmp/chip_measure.pid
echo "=== queue_r3b $(date) ===" >> "$LOG"

run() {
  echo "--- $1 ---" >> "$LOG"
  shift
  timeout 2400 "$@" 2>&1 | grep -v "WARNING\|cpu_aot" >> "$LOG"
  echo "" >> "$LOG"
}

# 1. fused bottleneck blocks after the 8-align DMA fix (commit 4426490)
run "backbone (s2d stem, fused blocks, post-fix)" \
  python -m object_detectors_tpu.analysis.backbone_ablate --bs 16 --fused

# 2. serving dispatch-budget decomposition (pooled scheduler)
run "serving budget" \
  python -m object_detectors_tpu.analysis.serving_ablate

# 3. weak BASELINE configs quick read
echo "--- bench weak configs ---" >> "$LOG"
timeout 3500 python bench.py --configs frcnn640 retinanet640 serving \
  2>&1 | grep -v "WARNING\|cpu_aot" >> "$LOG"

# 4. reference protocol CSV with the trained-YOLO artifact (map > 0)
echo "--- protocol csv ---" >> "$LOG"
timeout 2400 python bench.py --protocol \
  2>&1 | grep -v "WARNING\|cpu_aot" >> "$LOG"

rm -f /tmp/chip_measure.pid
echo "=== queue_r3b done $(date) ===" >> "$LOG"
