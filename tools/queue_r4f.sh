#!/bin/bash
# Round-4 session-3 queue: (1) retinanet post stage isolation with the
# deferred-decode order (select -> cap -> decode -> full: full-decode =
# NMS+final marginal), (2) retinanet bs32 full (batch amortization),
# (3) frcnn bs32 full (grouped pooler + SMEM batch chunking), (4) yolo
# train step at bs32 (grad stage amortization).
set -u
cd /root/repo
LOG=/tmp/queue_r4f.log
while [ -f /tmp/chip_measure.pid ] && \
      kill -0 "$(cat /tmp/chip_measure.pid)" 2>/dev/null; do
  sleep 45
done
echo $$ > /tmp/chip_measure.pid
echo "=== queue_r4f $(date) ===" >> "$LOG"

run() {
  echo "--- $1 $(date +%H:%M:%S) ---" >> "$LOG"
  shift
  timeout 2400 "$@" 2>&1 | grep -v "WARNING\|cpu_aot" >> "$LOG"
  echo "" >> "$LOG"
}

run "retinanet post isolation bs16 (cap/decode/full)" \
  python -m object_detectors_tpu.analysis.retinanet_ablate --bs 16 \
  --stages post_cap post_decode full

run "retinanet full bs32" \
  python -m object_detectors_tpu.analysis.retinanet_ablate --bs 32 \
  --stages full

run "frcnn full bs32 (grouped pooler)" \
  python -m object_detectors_tpu.analysis.frcnn_ablate --bs 32 \
  --stages full

run "yolo train ablate bs32" \
  python -m object_detectors_tpu.analysis.train_ablate --bs 32

rm -f /tmp/chip_measure.pid
echo "=== done $(date) ===" >> "$LOG"
