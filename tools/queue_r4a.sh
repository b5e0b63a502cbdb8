#!/bin/bash
# Round-4 measurement queue A — diagnostics for the two perf gaps:
#  * rpnfilter breakdown (what's inside frcnn's 8.6 ms filter stage)
#  * does bs32 amortize the FRCNN detection half?
#  * retinanet bs32
# Pauses the detached artifact trainer (1 CPU core — concurrent load
# skews timings) and resumes it at the end.
set -u
cd /root/repo
LOG=/tmp/queue_r4a.log
echo $$ > /tmp/chip_measure.pid
echo "=== queue_r4a $(date) ===" >> "$LOG"
bash tools/trainer_pause.sh stop >> "$LOG" 2>&1

run() {
  echo "--- $1 $(date +%H:%M:%S) ---" >> "$LOG"
  shift
  timeout 2400 "$@" 2>&1 | grep -v "WARNING\|cpu_aot" >> "$LOG"
  echo "" >> "$LOG"
}

run "rpnfilter ablate bs16" \
  python -m object_detectors_tpu.analysis.rpnfilter_ablate --bs 16

run "frcnn ablate bs32" \
  python -m object_detectors_tpu.analysis.frcnn_ablate --bs 32

run "retinanet bs32" python - <<'EOF'
import bench
print("retinanet bs32:", bench.run_retinanet(bs=32))
EOF

run "retinanet ablate bs16 (fresh baseline this round)" \
  python -m object_detectors_tpu.analysis.retinanet_ablate --bs 16

bash tools/trainer_pause.sh cont >> "$LOG" 2>&1
rm -f /tmp/chip_measure.pid
echo "=== done $(date) ===" >> "$LOG"
