#!/bin/bash
# Round-5 queue (e): decisions after r5d.
#  1. RetinaNet SERVE-pipeline select A/B: r5d read 337.5 img/s at
#     bs16 with the batched select default vs r4's 373.8 (perlevel) —
#     decide select_mode on the exact bench surface.
#  2. FRCNN in-graph pooler attribution, part 2: nofix was null
#     (56.7 vs 56.8), so split the remaining 16.2 ms marginal into
#     prep(+canvas) / kernel / unpermute; also re-baselines full with
#     the reverted perlevel filter topk.
set -u
cd /root/repo
LOG=/tmp/queue_r5e.log
while [ -f /tmp/chip_measure.pid ] && \
      kill -0 "$(cat /tmp/chip_measure.pid)" 2>/dev/null; do
  sleep 45
done
echo $$ > /tmp/chip_measure.pid
echo "=== queue_r5e $(date) ===" >> "$LOG"

run() {
  echo "--- $1 $(date +%H:%M:%S) ---" >> "$LOG"
  shift
  timeout 3600 "$@" 2>&1 | grep -v "WARNING\|cpu_aot" >> "$LOG"
  echo "" >> "$LOG"
}

run "retinanet serve select A/B bs16" \
  python - <<'EOF'
import json
import bench
for mode in ("perlevel", "batched"):
    v, m = bench.run_retinanet(bs=16, select_mode=mode)
    print(json.dumps({"select": mode, "img_s": round(v, 1), "mfu": m}))
EOF

run "frcnn pooler attribution part2 bs16" \
  python -m object_detectors_tpu.analysis.frcnn_ablate --bs 16 \
  --stages full_prep_only full_noperm full_pieces full

rm -f /tmp/chip_measure.pid
echo "=== done $(date) ===" >> "$LOG"
