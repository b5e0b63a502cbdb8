#!/bin/bash
# Round-5 queue (b): independent follow-ups after r5a.
#  1. FPN isolation (backbone vs resnet-only) — the pool the "pack the
#     FPN convs" idea could ever draw from (VERDICT r4 item 2 closure).
#  2. Majority-NMS while-body unroll 2/4/8 on the standalone p50 bench
#     (VERDICT item 8: adversarial tail 29.9 vs 19.0 us — deep chains
#     are trip-bound; the r4 unroll null was the RPN filter in-graph,
#     not this metric).
set -u
cd /root/repo
LOG=/tmp/queue_r5b.log
until grep -q "=== done" /tmp/queue_r5a.log 2>/dev/null; do
  sleep 60
done
while [ -f /tmp/chip_measure.pid ] && \
      kill -0 "$(cat /tmp/chip_measure.pid)" 2>/dev/null; do
  sleep 45
done
echo $$ > /tmp/chip_measure.pid
echo "=== queue_r5b $(date) ===" >> "$LOG"

run() {
  echo "--- $1 $(date +%H:%M:%S) ---" >> "$LOG"
  shift
  timeout 3600 "$@" 2>&1 | grep -v "WARNING\|cpu_aot" >> "$LOG"
  echo "" >> "$LOG"
}

run "fpn isolation bs16 (backbone vs resnet-only)" \
  python -m object_detectors_tpu.analysis.retinanet_ablate --bs 16 \
  --stages backbone_nofpn backbone

run "majority NMS unroll ladder (512x256->100)" \
  python -c "
import json
import bench
for u in (2, 4, 8):
    r = bench.run_nms_latency(unroll=u)
    print(json.dumps({'unroll': u, **{k: round(v['p50_us'], 2)
                                      for k, v in r.items()}}))
"

rm -f /tmp/chip_measure.pid
echo "=== done $(date) ===" >> "$LOG"
