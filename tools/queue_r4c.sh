#!/bin/bash
# Round-4 queue C — post-artifact decision measurements:
#  * retinanet postprocess INTERNAL budget (select/decode/cap/nms)
#  * frcnn marginal pooler/filter cost (leave-one-out, not prefix)
#  * train-step fwd/bwd budget (VERDICT item 4)
#  * frcnn640/retinanet640 after the NMS unroll=2 change
# Waits for the chip (artifact trainer registers chip_measure.pid).
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

run "frcnn marginal stages bs16" \
  python -m object_detectors_tpu.analysis.frcnn_ablate --bs 16 \
  --stages full full_no_pooler full_no_filter

run "train ablate bs16" \
  python -m object_detectors_tpu.analysis.train_ablate --bs 16

run "bench frcnn+retinanet after unroll" python - <<'EOF'
import bench
print("retinanet bs16:", bench.run_retinanet(bs=16))
print("frcnn bs16:", bench.run_frcnn(bs=16))
EOF

rm -f /tmp/chip_measure.pid
echo "=== done $(date) ===" >> "$LOG"
