#!/bin/bash
# Post-queue chain: wait for the main chip measurement queue, re-run the
# chip measurements that depend on this session's kernel fixes (fused
# bottleneck DMA alignment), THEN hand off to the CPU artifact trainer.
# Order matters on this 1-core host: chip timing runs must never overlap
# CPU-heavy jobs.
set -u
cd /root/repo
LOG=/tmp/chip_measure.log

while [ -f /tmp/chip_measure.pid ] && \
      kill -0 "$(cat /tmp/chip_measure.pid)" 2>/dev/null; do
  sleep 120
done

run() {
  echo "--- $1 ---" >> "$LOG"
  shift
  timeout 2400 "$@" 2>&1 | grep -v "WARNING\|cpu_aot" >> "$LOG"
  echo "" >> "$LOG"
}

echo "=== post_queue $(date) ===" >> "$LOG"
run "backbone (s2d stem, fused blocks, post-fix)" \
  python -m object_detectors_tpu.analysis.backbone_ablate --bs 16 --fused

exec bash tools/train_more_artifacts.sh
